"""Streaming ingestion observability: per-micro-batch telemetry
(input rows, watermark-dropped rows, user-observed metrics) surfaced
as a DataFrame — the monitoring surface a production stream needs
beside the data path (SURVEY.md §2.10 stretch; the reference has no
streaming at all).

Two signal sources, both zero-extra-scan:

- ``DataFrame.observe``: named aggregate expressions that ride the
  micro-batch execution (the same Observation mechanism the batch
  audit in ``operators/observe.py`` uses) — arbitrary user metrics
  (row counts, value sums, null counts) per batch;
- the engine's ``StreamingQueryProgress``: input row counts and the
  state operators' ``numRowsDroppedByWatermark`` — the late-data
  signal you alert on (rows silently excluded from results because
  they arrived behind the watermark).

Driver-side assembly of the progress list is monitoring telemetry
(O(batches) dicts), not a data-path collect.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OBSERVATION_NAME = "ingest_metrics"


def with_ingest_observation(
    stream_df: DataFrame,
    *metrics: Column,
    name: str = OBSERVATION_NAME,
) -> DataFrame:
    """Attach named observed metrics to a (streaming or batch) frame.
    Defaults to row count + distinct-free value checks callers extend
    with their own aggregate expressions."""
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("n_rows"),)
    return stream_df.observe(name, *metrics)


def drain_with_monitor(
    stream_df: DataFrame,
    query_name: str = "monitored_stream",
    output_mode: str = "append",
    observation_name: str = OBSERVATION_NAME,
) -> tuple[DataFrame, DataFrame]:
    """Run an availableNow drain and return
    ``(result_table, batch_metrics)``.

    ``batch_metrics`` has one row per micro-batch: ``batch_id``,
    ``input_rows``, ``state_rows_dropped_late`` (sum of
    numRowsDroppedByWatermark across state operators — the late-data
    alert signal), plus one column per observed metric. Built from the
    completed query's progress telemetry, so it costs nothing beyond
    the stream itself.
    """
    spark = stream_df.sparkSession
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
        progresses = list(q.recentProgress)

    rows = []
    metric_keys: list[str] = []
    for p in progresses:
        d = p if isinstance(p, dict) else p.asDict()  # PySpark version drift
        observed = (d.get("observedMetrics") or {}).get(observation_name)
        if observed is not None and not isinstance(observed, dict):
            observed = observed.asDict()
        observed = observed or {}
        for k in observed:
            if k not in metric_keys:
                metric_keys.append(k)
        dropped = sum(
            int(s.get("numRowsDroppedByWatermark", 0) or 0)
            for s in (d.get("stateOperators") or [])
        )
        rows.append(
            {
                "batch_id": int(d["batchId"]),
                "input_rows": int(d.get("numInputRows", 0) or 0),
                "state_rows_dropped_late": dropped,
                **{k: observed.get(k) for k in observed},
            }
        )
    # batches with no data still report (batchId, 0 rows) — keep them:
    # a silent empty batch IS a monitoring signal
    out_rows = [
        tuple(
            [r["batch_id"], r["input_rows"], r["state_rows_dropped_late"]]
            + [r.get(k) for k in metric_keys]
        )
        for r in rows
    ]
    schema = "batch_id long, input_rows long, state_rows_dropped_late long"
    for k in metric_keys:
        schema += f", {k} double"
    casted = [
        tuple(
            list(t[:3]) + [float(v) if v is not None else None for v in t[3:]]
        )
        for t in out_rows
    ]
    metrics_df = spark.createDataFrame(casted, schema)
    return spark.table(query_name), metrics_df
