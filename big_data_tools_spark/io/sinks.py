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


def parquet_layout_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) for a parquet directory, via the Hadoop
    FileSystem API so it works identically on file://, HDFS, and
    S3A-style stores (never os.walk — the driver may not share a
    filesystem with the data)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    n_files = 0
    total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):  # _SUCCESS, checksums, markers
            continue
        n_files += 1
        total += st.getLen()
    return n_files, total


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under an EVOLVING schema (columns added
    over time) as one frame: ``mergeSchema`` unions the per-file
    schemas (files missing a column read it as NULL) instead of
    silently answering with whichever footer got sampled first — the
    default picks an arbitrary file's schema, so a scan over old + new
    data can drop the new column entirely. Genuinely incompatible type
    changes (string vs int on the same name) fail the merge loudly,
    which is what a backfill job wants.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)
