"""As-of (temporal point-in-time) join — an operator the reference
lacks (its time handling is batch snapshot deltas, SURVEY.md §2.10) but
any event/feature pipeline needs: for each left row, attach the most
recent right row at-or-before its timestamp, per key.

Spark has no native ASOF JOIN; the classic scalable encoding is
union + window:

    union(left tagged 1, right tagged 0)
      -> window over (keys) ordered by (ts, tag)
      -> last(right_value, ignorenulls=True) rowsBetween(-inf, 0)
      -> keep left rows

This costs exactly ONE shuffle on the keys (the window sort), versus a
non-equi range join which Catalyst would plan as a broadcast nested
loop. Right rows sort before left rows at equal ts, so a right row at
the same instant is visible (ASOF ``left.ts >= right.ts`` semantics,
matching DuckDB's ASOF JOIN — which serves as the oracle twin).

Determinism contract: the right side must be unique per (keys, ts) —
pre-aggregate it if not (the query layer does) — otherwise which
same-ts right row wins is tie-broken arbitrarily by both engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Backward as-of left join.

    Returns ``left``'s columns plus, for each name in ``value_cols``,
    the value from the latest ``right`` row with ``right_ts <=
    left_ts`` and equal join keys (null when no such row). When
    ``matched_ts_col`` is given, also emits the matched right
    timestamp under that name.
    """
    on = list(on)
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in on and c != right_ts]
    )
    left_cols = left.columns
    if overlap := set(value_cols) & set(left_cols):
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    tag = "__asof_tag"
    ts = "__asof_ts"
    r = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(tag),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).alias(c) for c in left_cols if c not in on],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias(ts),
        F.lit(1).alias(tag),
        *[F.lit(None).cast(dict(r.dtypes)[c]).alias(c) for c in value_cols],
        *[F.col(c) for c in left_cols if c not in on],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col(tag).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = r.unionByName(l)
    for c in value_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if matched_ts_col is not None:
        filled = filled.withColumn(
            matched_ts_col,
            F.last(F.when(F.col(tag) == 0, F.col(ts)), ignorenulls=True).over(w),
        )
    out_cols = (
        on
        + [F.col(ts).alias(left_ts)]
        + [c for c in left_cols if c not in on and c != left_ts]
        + value_cols
        + ([matched_ts_col] if matched_ts_col else [])
    )
    return filled.filter(F.col(tag) == 1).select(*out_cols)
