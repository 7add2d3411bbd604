"""Streaming observability (streaming/monitor.py): per-batch telemetry
must reconcile with the actual data the stream processed."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.streaming.events import (
    hourly_event_counts,
    read_events_stream,
)
from big_data_tools_spark.streaming.monitor import (
    drain_with_monitor,
    with_ingest_observation,
)


def test_monitor_reconciles_with_batch(spark, sf_smoke):
    stream = read_events_stream(spark, sf_smoke, path_glob="events.parquet")
    observed = with_ingest_observation(
        stream,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("value_sum"),
    )
    result, metrics = drain_with_monitor(
        hourly_event_counts(observed),
        query_name="bdt_monitor_test",
        output_mode="complete",
    )
    m = metrics.collect()
    assert len(m) >= 1  # at least one micro-batch reported

    events = load_table(spark, sf_smoke, "events")
    n_events = events.count()
    # engine-reported input rows across batches == the table's rows
    assert sum(r["input_rows"] for r in m) == n_events
    # observed metric agrees with the engine's own count
    assert sum(int(r["n_rows"] or 0) for r in m) == n_events
    # observed value_sum matches the batch-side exact-decimal sum
    want = events.agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("s")
    ).collect()[0]["s"]
    got = round(sum(float(r["value_sum"] or 0.0) for r in m), 2)
    assert got == want
    # availableNow over static files: nothing should drop as late
    assert all(r["state_rows_dropped_late"] == 0 for r in m)
    # and the data path itself produced the batch-twin's rows
    assert result.count() == hourly_event_counts(events).count()
