"""Partitioning guards.

Small-file inputs (one parquet file = one input split) serialize
compute-heavy operators onto a single core even on a 32-core executor
— and on a real cluster, onto a single task. Operators whose per-row
cost is high (shingling, hashing, vector math) fan the input out to
the session's default parallelism first; the repartition shuffle is
tiny relative to the compute it unlocks.

At 100 TB inputs arrive in thousands of splits and ``fan_out`` becomes
a no-op (it never *reduces* partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, key: str | None = None, min_factor: int = 1) -> DataFrame:
    """Repartition ``df`` up to the session default parallelism if it
    currently has fewer partitions. Hash-partitions by ``key`` when
    given (stable co-location for downstream groupBys), round-robin
    otherwise."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key) if key else df.repartition(target)


def compact(
    df: DataFrame,
    target_partition_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> DataFrame:
    """Prepare a frame for writing as right-sized, optionally
    range-clustered files — the periodic maintenance pass that keeps a
    100 TB table scannable.

    - Small-file compaction: estimates the frame's on-disk footprint
      from the optimizer's size statistics and coalesces/repartitions
      to ``ceil(bytes / target_partition_bytes)`` partitions, so each
      written file lands near the parquet sweet spot (~128 MB) instead
      of thousands of KB-sized files (which at scale dominate driver
      listing time and task-launch overhead).
    - ``cluster_by``: range-repartitions on the given keys and sorts
      within partitions, so writes produce files whose per-column
      min/max spans are narrow and disjoint — parquet row-group and
      file skipping then prunes reads on those keys (the
      sort-based sibling of z-ordering; for one key or correlated
      keys the linear order gives the same skipping).

    Statistics note: ``sizeInBytes`` comes from the logical plan
    (file sizes for scans, propagated estimates otherwise) — cheap,
    no job runs. The estimate only chooses the partition COUNT;
    correctness never depends on it.
    """
    import math

    stats = df._jdf.queryExecution().optimizedPlan().stats()
    size = int(stats.sizeInBytes())
    n = max(1, math.ceil(size / target_partition_bytes))
    if cluster_by:
        cols = [df[c] for c in cluster_by]
        return df.repartitionByRange(n, *cols).sortWithinPartitions(*cluster_by)
    cur = df.rdd.getNumPartitions()
    # growing the partition count requires a shuffle; shrinking can
    # narrow (coalesce) for free
    return df.coalesce(n) if n < cur else df.repartition(n)
