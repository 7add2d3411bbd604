"""Structured Streaming veneer over the events table (SURVEY.md §2.10).

The reference has no streaming at all; this is the explicitly
beyond-reference stretch layer: tumbling-window counts with a
watermark for late data, expressed so the batch query
``events_hourly`` (queries/semistructured.py) is the exact batch twin
— tests assert stream(availableNow) == batch on the same files.

Scale notes: the aggregation state is keyed by (window, event_type);
the watermark bounds state size; `availableNow` gives incremental
batch-style backfills with the same code path as live streams.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet stores ts as TIMESTAMP(NANOS); with the legacy conf we
# read it as long nanos and convert in-plan (same policy as io.sources).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """Streaming source over a directory of events parquet files."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(source_dir)
    # integer div (see io.sources): double division rounds the µs for
    # nano epochs beyond 2^53
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_event_counts(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a
    watermark for late data. Works on both stream and batch frames
    (same expression tree -> same semantics)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
                "value_sum"
            ),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str = "events_agg",
    output_mode: str = "complete",
) -> DataFrame:
    """Drain all currently-available input through the streaming engine
    (Trigger.AvailableNow) into an in-memory sink and return the result
    as a DataFrame. Used for stream==batch equivalence tests and
    incremental backfills."""
    with tempfile.TemporaryDirectory(prefix="bdt_ckpt_") as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(query_name)


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key in state only
    until the watermark passes it, so at-least-once sources (Kafka
    redelivery, file re-lists) dedup with O(events-per-watermark)
    state instead of O(all-history) — the correct 100 TB streaming
    dedup. Works on batch frames too (plain dropDuplicates) so the
    batch twin is the same call.
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])
