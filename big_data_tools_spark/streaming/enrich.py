"""Stream-static enrichment (SURVEY.md §2.10 stretch): a streaming
fact joined to a static dimension, then windowed-aggregated — the
canonical "enrich the click stream with the user table" shape.

Structured Streaming executes a stream-static join per micro-batch
with NO state (the static side is just re-planned each batch), so it
scales with the batch, not the history. The dim side is explicitly
``broadcast()``: on a 1000-executor cluster the static table ships
once per executor instead of shuffling every micro-batch — without
the hint a large dim would force a per-batch sort-merge shuffle of
the stream.

The same function body runs on a batch frame (watermark skipped), so
the stream==batch equivalence test and the driver's rows-only check
share one code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_cols: list[str],
) -> DataFrame:
    """Left join ``facts`` to a broadcast ``dim`` projection; rows with
    no dim match keep nulls (facts must never be dropped by late or
    missing dimension rows)."""
    d = dim.select(F.col(dim_key).alias(fact_key), *dim_cols)
    return facts.join(F.broadcast(d), fact_key, "left")


def segment_value_hourly(
    events: DataFrame,
    customers: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Hourly event count + value sum per customer market segment,
    fed by a stream-static broadcast join. Batch frames skip the
    watermark — same expression tree, same results."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    enriched = enrich_with_dim(
        src, customers, "user_id", "c_custkey", ["c_mktsegment"]
    )
    return (
        enriched.groupBy(
            F.window("ts", window).alias("win"),
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("value_sum"),
        )
        .select(F.col("win.start").alias("hour"), "segment", "n", "value_sum")
    )
