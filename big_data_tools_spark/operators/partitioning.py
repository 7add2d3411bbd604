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
