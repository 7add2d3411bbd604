"""Interval (range) join: pair left rows with right rows whose
timestamp falls inside a per-left-row window ``[left_ts + lo,
left_ts + hi]``, sharing equality keys.

Beyond the reference (its only joins are single-key equi-joins,
SURVEY.md §2.4 — `Databricks Notebook.py:347-641`), but essential for
event analytics (attribution windows, nearby-event counts).

Scale design: Spark has no native band-join strategy — a naive
``l.join(r, (keys) & (r.ts between ...))`` plans as an equi-join on
the keys followed by a post-filter, which is fine when keys are
selective but degenerates to a per-key cross product when a key has
many rows on both sides (hot users at 100 TB). This implementation
uses **bucketed banding** (the same trick Flink's interval join and
DuckDB's IEJoin literature apply): quantize time into buckets of
``bucket_sec``, explode the left side into the handful of candidate
buckets its window spans, equi-join on ``keys + bucket`` — now the
join is a pure hash join whose build keys include time, so a hot
user's rows only meet right rows from overlapping buckets — then
apply the exact range predicate. Each right row lives in exactly one
bucket, so no dedup is needed. Choose ``bucket_sec ≈ hi - lo`` so the
explode factor stays at 2-3×.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lo_sec: int,
    hi_sec: int,
    bucket_sec: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` to ``right`` where
    ``right_ts ∈ [left_ts + lo_sec, left_ts + hi_sec]`` (inclusive,
    epoch-second granularity) and the ``on`` keys match.

    Returns all columns of ``left`` plus all non-key columns of
    ``right``. ``how`` may be ``inner`` or ``left`` (unmatched left
    rows kept with nulls).

    Timestamps are compared at whole-second resolution
    (``cast(ts as long)`` = ``floor(epoch(ts))``), matching the
    DuckDB oracle convention used across this repo.
    """
    if lo_sec > hi_sec:
        raise ValueError(f"empty window: lo_sec={lo_sec} > hi_sec={hi_sec}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    if bucket_sec is None:
        bucket_sec = max(hi_sec - lo_sec, 1)

    keys = list(on)
    lsec = F.col(left_ts).cast("long")
    rsec = F.col(right_ts).cast("long")

    if how == "left":
        # Tag each left row with a surrogate id BEFORE banding so
        # matches graft back on the id alone: a join-back on the full
        # column list is null-UNSAFE (a left row with a NULL in any
        # non-key column would never rejoin its matches) and multiplies
        # duplicate left rows. Persist the tagged frame — it feeds both
        # the banded join and the graft-back, and
        # monotonically_increasing_id must not be recomputed per
        # consumer. Caller releases via operators.cache.release_caches.
        from .cache import track_cache

        tagged = left.withColumn("__lid", F.monotonically_increasing_id()).persist()
        lb = tagged.withColumn("__lsec", lsec).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor((F.col("__lsec") + lo_sec) / bucket_sec),
                    F.floor((F.col("__lsec") + hi_sec) / bucket_sec),
                )
            ),
        )
        rb = right.withColumn("__rsec", rsec).withColumn(
            "__bucket", F.floor(F.col("__rsec") / bucket_sec)
        )
        in_range = (F.col("__rsec") >= F.col("__lsec") + lo_sec) & (
            F.col("__rsec") <= F.col("__lsec") + hi_sec
        )
        right_cols = [c for c in right.columns if c not in keys]
        matched = (
            lb.join(rb, on=[*keys, "__bucket"], how="inner")
            .filter(in_range)
            .select("__lid", *right_cols)
        )
        out = tagged.join(matched, on="__lid", how="left").select(
            *left.columns, *right_cols
        )
        return track_cache(out, tagged)

    lb = left.withColumn("__lsec", lsec).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((F.col("__lsec") + lo_sec) / bucket_sec),
                F.floor((F.col("__lsec") + hi_sec) / bucket_sec),
            )
        ),
    )
    rb = right.withColumn("__rsec", rsec).withColumn(
        "__bucket", F.floor(F.col("__rsec") / bucket_sec)
    )

    in_range = (F.col("__rsec") >= F.col("__lsec") + lo_sec) & (
        F.col("__rsec") <= F.col("__lsec") + hi_sec
    )
    right_cols = [c for c in right.columns if c not in keys]
    out = lb.join(rb, on=[*keys, "__bucket"], how="inner").filter(in_range)
    return out.select(*left.columns, *right_cols)
