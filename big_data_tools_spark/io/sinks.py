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
