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

# events.parquet has shipped ts as TIMESTAMP(NANOS) (reads as long with
# the legacy conf) and as TIMESTAMP(MICROS, isAdjustedToUTC=false); both
# normalize to an LTZ TIMESTAMP of the same UTC instant (io.sources
# policy). readStream needs an explicit schema, so probe the footer via
# a batch read (lazy — schema only, no data scan) and pick the variant.


def _events_stream_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


EVENTS_STREAM_SCHEMA = _events_stream_schema(T.TimestampType())


def read_events_stream(
    spark: SparkSession, source_dir: str, path_glob: str | None = None
) -> DataFrame:
    """Streaming source over a directory of events parquet files.

    ``path_glob`` narrows the directory listing (e.g.
    ``"events.parquet"`` when streaming straight off an sf_dir that
    also holds the other tables).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # scope the NTZ-inference conf to the footer probe (io.sources
    # policy: other tables' dtypes must not depend on load order); the
    # stream itself reads with an explicit schema, inference-free
    prev_ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", None)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try:
        batch = spark.read
        if path_glob:
            batch = batch.option("pathGlobFilter", path_glob)
        probe = dict(batch.parquet(source_dir).dtypes).get("ts")
    finally:
        if prev_ntz is None:
            spark.conf.unset("spark.sql.parquet.inferTimestampNTZ.enabled")
        else:
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev_ntz)
    ts_type = T.LongType() if probe == "bigint" else T.TimestampType()
    reader = spark.readStream.schema(_events_stream_schema(ts_type))
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    raw = reader.parquet(source_dir)
    if probe == "bigint":  # TIMESTAMP(NANOS) under the legacy conf
        # integer div (see io.sources): double division rounds the µs
        # for nano epochs beyond 2^53
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


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


def rolling_dau_approx(
    events: DataFrame,
    watermark: str = "2 days",
    window: str = "7 days",
    slide: str = "1 day",
    rsd: float = 0.02,
) -> DataFrame:
    """Sliding 7-day distinct active users as a STREAMING metric.

    The exact sliding distinct (batch twin: ``events_rolling_dau``,
    queries/timeseries.py) needs two chained distinct aggregations —
    not expressible in one streaming query — so the streaming form
    keeps a mergeable HLL++ sketch per sliding window instead:
    ``approx_count_distinct`` state is O(windows x sketch size), the
    watermark closes windows, and sketch merge is order-independent,
    so the availableNow drain is BIT-EQUAL to running the same
    expression in batch (asserted in tests/test_streaming.py, along
    with a relative-error band vs the exact batch operator). This is
    the shape a 100 TB live DAU dashboard actually runs — the exact
    fan-out variant stays the nightly batch job.

    ``win_day`` is the day each [day-6, day] trailing window reports
    for (window end minus one slide), matching the batch operator's
    ``day`` column.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("win"))
        .agg(F.approx_count_distinct("user_id", rsd).alias("dau_7d_approx"))
        .select(
            F.date_add(F.col("win.end").cast("date"), -1).alias("win_day"),
            "dau_7d_approx",
        )
    )
