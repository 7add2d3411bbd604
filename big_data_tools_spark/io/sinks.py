"""Sinks: Parquet writers (SURVEY.md §2.1 — the reference persists
nothing; our engine makes partitioned Parquet the canonical sink).

Scale defaults baked in:
- ``partition_by`` for partition-pruned downstream reads (date/state
  style columns);
- ``max_records_per_file`` guards the many-small-files and the
  one-giant-file failure modes;
- writer-side sort within partitions (optional) for better column
  compression and rowgroup skipping.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = 5_000_000,
    sort_within_partitions: Sequence[str] | None = None,
) -> None:
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (`bucketBy` requires saveAsTable).

    The co-located-join path: two tables bucketed the same way on the
    join key sort-merge-join with ZERO exchanges — at 100 TB that
    removes the dominant shuffle from every repeated join on that key.
    Bucket count is a layout decision: ~(table size / 128 MB) rounded
    to a power of two, matched across the tables that join.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)
