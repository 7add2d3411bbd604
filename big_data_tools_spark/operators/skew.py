"""Skew-mitigation operators (SURVEY.md §4.4 scale rules).

AQE's skew-join splitting handles joins; *aggregations* over
low-cardinality or power-law keys still funnel each hot key through a
single reducer. ``salted_aggregate`` does the classic two-phase fix:
pre-aggregate on (key, salt) to spread each hot key over N reducers,
then merge the partials. Works for any algebraic aggregate (sum /
count / min / max) — results are exactly equal to the direct groupBy,
so salted queries remain oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (merge_fn, partial_fn) pairs for algebraic aggregates
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (kind, column) with kind in
    sum/count/min/max. Phase 1 groups by (keys..., salt) where salt =
    a stable per-row bucket; phase 2 merges partials by keys. The salt
    must be deterministic (hash of a high-cardinality column, not
    rand()) so results are reproducible run to run.

    ``salt_cols`` names the column(s) the salt hashes — pass one
    high-cardinality column (a row id / natural key). Defaults to every
    column, which is correct but reads the full row width: with an
    explicit salt column the scan stays pruned to keys + agg inputs +
    salt (PLANS.md evidences the difference).
    """
    for name, (kind, _) in aggs.items():
        if kind not in _MERGES:
            raise ValueError(f"{name}: unsupported aggregate kind {kind!r}")

    salt = (F.abs(F.xxhash64(*(salt_cols or df.columns))) % salt_buckets).alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            (F.count(col) if kind == "count" else getattr(F, kind)(col)).alias(f"__p_{name}")
            for name, (kind, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGES[kind](F.col(f"__p_{name}")).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )
