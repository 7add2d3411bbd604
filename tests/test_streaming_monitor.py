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


def test_value_drift_stream_equals_batch(spark, sf_smoke):
    """The drift monitor's stateful step must produce the identical
    (day, bin, n) grid whether drained through the streaming engine
    or computed on the batch frame — and therefore identical per-day
    JSD (the stream==batch contract every §2.10 surface carries).
    The no-drift sanity also rides along: a day whose distribution
    matches the reference closely must score near 0 bits."""
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.queries import get
    from big_data_tools_spark.streaming.monitor import (
        jsd_vs_reference,
        value_drift_by_day,
    )

    import datetime

    from big_data_tools_spark.streaming.events import (
        read_events_stream,
        run_available_now,
    )

    # the stateful grid, drained through the engine vs computed batch
    stream = read_events_stream(spark, sf_smoke, path_glob="events.parquet")
    drained = run_available_now(
        value_drift_by_day(stream), "drift_eq_q", output_mode="append"
    )
    s_grid = {(r["day"], r["bin"]): r["n"] for r in drained.collect()}
    b_grid = {
        (r["day"], r["bin"]): r["n"]
        for r in value_drift_by_day(
            load_table(spark, sf_smoke, "events")
        ).collect()
    }
    # append mode emits only watermark-CLOSED day windows: the stream
    # grid is a subset of batch, cell-for-cell IDENTICAL where
    # emitted, and complete behind the 2-day horizon
    assert set(s_grid) <= set(b_grid)
    assert all(b_grid[k] == v for k, v in s_grid.items())
    horizon = max(d for d, _ in b_grid) - datetime.timedelta(days=3)
    behind = {k for k in b_grid if k[0] <= horizon}
    assert behind <= set(s_grid), sorted(behind - set(s_grid))

    # the registered end-to-end surface: sane bits, non-vacuous
    scores = {
        r["day"]: r["jsd_bits"]
        for r in get("streaming_value_drift").fn(spark, sf_smoke).collect()
    }
    assert scores
    for bits in scores.values():
        assert 0.0 <= bits <= 1.0
    # batch replication over the SAME day subset must agree exactly
    batch_subset = jsd_vs_reference(drained)
    assert scores == {
        r["day"]: r["jsd_bits"] for r in batch_subset.collect()
    }


def test_cms_stream_equals_batch(spark, sf_smoke):
    """The streaming CMS's per-day partial grids must be cell-for-cell
    identical to the batch computation where emitted, complete behind
    the watermark horizon, and their cell-wise merge must reproduce
    the batch sketch's estimates EXACTLY for every probe key covered
    by the emitted days (CMS linearity on the real engine)."""
    import datetime

    from big_data_tools_spark.queries import get
    from big_data_tools_spark.streaming.events import (
        read_events_stream,
        run_available_now,
    )
    from big_data_tools_spark.streaming.monitor import (
        cms_cells_by_day,
        cms_merge_and_probe,
    )

    stream = read_events_stream(spark, sf_smoke, path_glob="events.parquet")
    drained = run_available_now(
        cms_cells_by_day(stream), "cms_eq_q", output_mode="append"
    ).persist()
    events = load_table(spark, sf_smoke, "events")
    s_grid = {(r["day"], r["r"], r["b"]): r["n"] for r in drained.collect()}
    b_grid = {
        (r["day"], r["r"], r["b"]): r["n"]
        for r in cms_cells_by_day(events).collect()
    }
    assert set(s_grid) <= set(b_grid)
    assert all(b_grid[k] == v for k, v in s_grid.items())
    horizon = max(d for d, _, _ in b_grid) - datetime.timedelta(days=3)
    behind = {k for k in b_grid if k[0] <= horizon}
    assert behind <= set(s_grid), sorted(behind - set(s_grid))

    # linearity end-to-end: the registered surface (merge the drained
    # streaming partials, probe the covered-day exact top-10) must
    # equal the SAME pipeline fed the batch per-day grids restricted
    # to the emitted days — identical cells in, identical report out
    emitted_days = {d for d, _, _ in s_grid}
    probe = {
        r["user_id"]: (r["exact_count"], r["cms_est"], r["overestimate"])
        for r in cms_merge_and_probe(drained, events).collect()
    }
    batch_cells = cms_cells_by_day(events).filter(
        F.col("day").isin(list(emitted_days))
    )
    replay = {
        r["user_id"]: (r["exact_count"], r["cms_est"], r["overestimate"])
        for r in cms_merge_and_probe(batch_cells, events).collect()
    }
    assert probe == replay
    for _, (exact, est, over) in probe.items():
        assert over >= 0  # one-sided CMS error holds on covered days
        assert est >= exact
    # when the stream has emitted EVERY day, the report is exactly the
    # batch CMS query's (full coverage -> identical sketch + counts)
    if emitted_days == {d for d, _, _ in b_grid}:
        batch = {
            r["user_id"]: (r["exact_count"], r["cms_est"], r["overestimate"])
            for r in get("events_cms_heavy_hitters")
            .fn(spark, sf_smoke)
            .collect()
        }
        assert probe == batch
    drained.unpersist()
