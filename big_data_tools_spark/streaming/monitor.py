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


_DRIFT_BINS = 10
_DRIFT_BIN_WIDTH = 50.0  # fixed edges: value in [0, 500) covers events
_DRIFT_LN2 = 0.6931471805599453


def value_drift_by_day(events: DataFrame) -> DataFrame:
    """Per-day Jensen-Shannon drift of the event-value distribution
    against the all-time reference — the STREAMING member of the
    drift family (orders_price_psi / orders_price_jsd are the batch
    members).

    Streaming shape: the ONLY stateful step is one windowed (day,
    bin) count with a watermark — fixed bin edges (a streaming
    aggregation cannot see global min/max, so edges are declared, the
    same contract as every production drift monitor), state is
    O(days-in-watermark x bins). The reference distribution and the
    per-day JSD are bounded-grid batch math over the DRAINED counts
    (|days| x 10 rows) — chaining a second aggregate onto a streaming
    agg is not expressible in append mode, and it does not need to
    be: the drained grid is tiny forever. Works identically on a
    batch frame (same code path minus the watermark), which is what
    the stream==batch equality test asserts."""
    src = (
        events.withWatermark("ts", "2 days")
        if events.isStreaming
        else events
    )
    binned = src.groupBy(
        F.window("ts", "1 day").alias("win"),
        F.least(
            F.floor(F.col("value") / _DRIFT_BIN_WIDTH),
            F.lit(_DRIFT_BINS - 1),
        )
        .cast("bigint")
        .alias("bin"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return binned.select(
        F.col("win.start").cast("date").alias("day"), "bin", "n"
    )


def jsd_vs_reference(day_bins: DataFrame) -> DataFrame:
    """Finish the drift report over the drained (day, bin, n) grid:
    per-day Laplace-smoothed shares vs the all-days reference,
    per-day JSD in bits (entropy-rate quantization policy). Pure
    bounded-grid batch math."""
    from pyspark.sql.window import Window

    ref = day_bins.groupBy("bin").agg(F.sum("n").alias("n_ref"))
    ref_tot = ref.agg(F.sum("n_ref").alias("t_ref"))
    day_tot = day_bins.groupBy("day").agg(F.sum("n").alias("t_day"))
    smooth = 0.5 * _DRIFT_BINS
    # renamed copy for the third reference to the drained frame — a
    # memory-sink view joined against its own aggregates trips
    # Spark's conflicting-reference resolution otherwise
    cells = day_bins.select(
        F.col("day").alias("c_day"), F.col("bin").alias("c_bin"), "n"
    )
    grid = (
        day_tot.crossJoin(F.broadcast(ref))
        .join(
            cells,
            (F.col("day") == F.col("c_day")) & (F.col("bin") == F.col("c_bin")),
            "left",
        )
        .crossJoin(F.broadcast(ref_tot))
        .select(
            "day",
            "bin",
            (
                (F.coalesce(F.col("n"), F.lit(0)).cast("double") + 0.5)
                / (F.col("t_day") + F.lit(smooth))
            ).alias("p"),
            (
                (F.col("n_ref").cast("double") + 0.5)
                / (F.col("t_ref") + F.lit(smooth))
            ).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    m = (p + q) / 2
    term = F.round(
        (
            F.lit(0.5) * p * F.round(F.log(p / m), 6)
            + F.lit(0.5) * q * F.round(F.log(q / m), 6)
        )
        / F.lit(_DRIFT_LN2),
        8,
    )
    return (
        grid.select("day", term.alias("jsd_term"))
        .groupBy("day")
        .agg(
            F.round(
                F.sum(F.col("jsd_term").cast("decimal(28,10)")).cast("double"),
                6,
            ).alias("jsd_bits")
        )
    )


_CMS_D = 4    # keep in sync with queries/scale.py events_cms_heavy_hitters
_CMS_W = 512


def cms_cells_by_day(events: DataFrame) -> DataFrame:
    """Per-day partial Count-Min sketches as a streaming aggregation:
    one watermarked (day, r, b) count over the exploded cell positions
    of each event's user key — the STREAMING member of the sketch
    family (events_cms_heavy_hitters / events_user_kmv_distinct are
    the batch members).

    The point is the CMS's linearity: each micro-batch/day contributes
    an independent partial grid, and the global sketch is the plain
    cell-wise SUM of the drained partials — no raw-key replay, state
    bounded at O(days-in-watermark x d x w) cells. This is exactly the
    map-side-rollup contract that lets 1000 executors sketch a 100 TB
    stream shard-locally. Works identically on a batch frame (minus
    the watermark), which the stream==batch test asserts."""
    from ..operators.sampling import cms_positions

    src = (
        events.withWatermark("ts", "2 days")
        if events.isStreaming
        else events
    )
    pos = src.select(
        "ts", cms_positions(F.col("user_id"), _CMS_D, _CMS_W).alias("p")
    ).select("ts", "p.r", "p.b")
    cells = pos.groupBy(
        F.window("ts", "1 day").alias("win"), "r", "b"
    ).agg(F.count(F.lit(1)).alias("n"))
    return cells.select(
        F.col("win.start").cast("date").alias("day"), "r", "b", "n"
    )


def cms_merge_and_probe(day_cells: DataFrame, events: DataFrame) -> DataFrame:
    """Finish the streaming sketch report over the drained (day, r,
    b, n) partial grids: merge cell-wise (linearity), then probe the
    exact top-10 users — same audit schema as the batch CMS query
    plus the covered-day count. The exact counts are computed over
    the COVERED days only (append mode holds watermark-open days
    back, so the sketch legitimately hasn't seen them yet); that
    keeps the one-sided guarantee overestimate >= 0 true for the
    partially-drained stream, exactly as it is for the batch sketch."""
    from ..operators.sampling import cms_positions

    merged = day_cells.groupBy("r", "b").agg(
        F.sum("n").cast("bigint").alias("cnt")
    )
    days = day_cells.select("day").distinct()
    n_days = days.count()
    covered = events.join(
        F.broadcast(days),
        events["ts"].cast("date") == days["day"],
        "left_semi",
    )
    exact = covered.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    top = exact.orderBy(F.desc("exact_count"), F.asc("user_id")).limit(10)
    probe = top.select(
        "user_id",
        "exact_count",
        cms_positions(F.col("user_id"), _CMS_D, _CMS_W).alias("p"),
    ).select("user_id", "exact_count", "p.r", "p.b")
    return (
        probe.join(F.broadcast(merged), ["r", "b"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
        .select(
            "user_id",
            "exact_count",
            "cms_est",
            (F.col("cms_est") - F.col("exact_count")).alias("overestimate"),
            F.lit(n_days).cast("bigint").alias("n_partial_days"),
        )
    )
