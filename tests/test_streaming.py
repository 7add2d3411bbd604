"""Streaming veneer tests (SURVEY.md §2.10 stretch): the streamed
tumbling-window aggregation must equal its batch twin on the same files.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.streaming.events import (
    hourly_event_counts,
    read_events_stream,
    run_available_now,
)


@pytest.fixture(scope="module")
def events_dir(sf_smoke):
    d = tempfile.mkdtemp(prefix="bdt_events_")
    shutil.copy(f"{sf_smoke}/events.parquet", f"{d}/events.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_equals_batch(spark, events_dir, sf_smoke):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    agg = hourly_event_counts(stream)
    result = run_available_now(agg, "hourly_test")

    batch = hourly_event_counts(load_table(spark, sf_smoke, "events"))
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    assert len(got) > 0


def test_watermark_present_in_stream_plan(spark, events_dir):
    agg = hourly_event_counts(read_events_stream(spark, events_dir), watermark="3 hours")
    # watermark node must exist in the logical plan for state cleanup
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()


def test_stateful_sessions_match_batch_closed_sessions(spark, sf_smoke):
    """Streamed (closed) sessions == batch sessions minus each user's
    final session (which only closes via timeout after the drain)."""
    from big_data_tools_spark.queries import get

    streamed = get("streaming_sessions").fn(spark, sf_smoke)
    s_rows = {
        (r["user_id"], r["n_events"], r["duration_sec"])
        for r in streamed.collect()
    }
    batch = get("event_sessions").fn(spark, sf_smoke)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id")
    non_final = batch.withColumn("max_sid", F.max("session_id").over(w)).filter(
        F.col("session_id") < F.col("max_sid")
    )
    b_rows = {
        (r["user_id"], r["n_events"], r["duration_sec"])
        for r in non_final.collect()
    }
    # every batch-closed session must be streamed; stream may addition-
    # ally emit timeout-flushed finals if the engine ran a flush batch
    assert b_rows <= s_rows, f"missing: {sorted(b_rows - s_rows)[:5]}"
    extras = s_rows - b_rows
    finals = {
        (r["user_id"], r["n_events"], r["duration_sec"])
        for r in batch.withColumn("max_sid", F.max("session_id").over(w))
        .filter(F.col("session_id") == F.col("max_sid"))
        .collect()
    }
    assert extras <= finals, f"unexpected sessions: {sorted(extras - finals)[:5]}"


def test_streaming_dedup_within_watermark(spark, tmp_path, sf_smoke):
    """Duplicated events (at-least-once redelivery) drain to exactly
    one row per event_id, matching the batch distinct count."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.streaming.events import dedup_events_stream

    src = str(tmp_path / "dup_events")
    events = load_table(spark, sf_smoke, "events").limit(500)
    # re-written parquet carries micros timestamps — read the stream
    # with the written schema, no nanos conversion needed
    events.write.mode("overwrite").parquet(src)
    # redeliver ~40% of events a second time (file source re-list)
    events.filter(F.col("event_id") % 5 < 2).write.mode("append").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = run_available_now(
        dedup_events_stream(stream), "bdt_stream_dedup", output_mode="append"
    )
    assert out.count() == 500
    assert out.select("event_id").distinct().count() == 500


def test_stream_static_enrich_equals_batch(spark, events_dir, sf_smoke):
    """Stream-static broadcast enrichment drains to exactly the batch
    join's result; unmatched users roll up under UNKNOWN."""
    from big_data_tools_spark.streaming.enrich import segment_value_hourly

    customers = load_table(spark, sf_smoke, "customer")
    stream = read_events_stream(spark, events_dir)
    result = run_available_now(
        segment_value_hourly(stream, customers), "enrich_test"
    )
    batch = segment_value_hourly(load_table(spark, sf_smoke, "events"), customers)
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    assert len(got) > 0
    assert {r[1] for r in got} - {"UNKNOWN"}  # real segments present


def test_stream_stream_interval_join_equals_batch(spark, events_dir, sf_smoke):
    """Stream-stream interval join (purchase<-click attribution) drains
    to exactly the batch self-join's pairs."""
    from big_data_tools_spark.streaming.joins import purchase_click_pairs

    stream = read_events_stream(spark, events_dir)
    result = run_available_now(
        purchase_click_pairs(stream), "attrib_test", output_mode="append"
    )
    batch = purchase_click_pairs(load_table(spark, sf_smoke, "events"))
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    assert len(got) > 0


def test_foreachbatch_upsert_rollup(spark, events_dir, sf_smoke, tmp_path):
    """foreachBatch upsert sink: the maintained rollup table equals the
    batch aggregation, and re-draining the same input is idempotent."""
    from big_data_tools_spark.streaming.upsert import read_rollup, upsert_rollup_sink

    out = str(tmp_path / "rollup")

    def drain():
        stream = read_events_stream(spark, events_dir)
        q = upsert_rollup_sink(stream, out)
        q.awaitTermination()

    drain()
    got = {tuple(r) for r in read_rollup(spark, out).collect()}

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_smoke, "events")
    want = {
        tuple(r)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("value_sum"),
        )
        .select("n", "value_sum", "event_type")  # partition col reads last
        .collect()
    }
    assert got == want and len(got) > 0

    drain()  # replay the same input: totals unchanged (idempotent)
    again = {tuple(r) for r in read_rollup(spark, out).collect()}
    assert again == got


def test_stateless_rollup_equals_batch_and_replays_idempotently(spark, sf_smoke, tmp_path):
    """The merge-based sink must (a) converge to the batch recompute
    and (b) not double-count when the same batch id is re-delivered."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.incremental import (
        aggregate_state,
        finish_rollup,
    )
    from big_data_tools_spark.queries import get

    got = sorted(
        map(tuple, get("streaming_stateless_rollup").fn(spark, sf_smoke).collect())
    )
    events = load_table(spark, sf_smoke, "events")
    want = sorted(
        map(
            tuple,
            finish_rollup(
                aggregate_state(events, ["event_type"], "value"), ["event_type"]
            ).collect(),
        )
    )
    assert got == want

    # replay: drain the sink twice into the SAME private table path —
    # the second drain restarts batch ids at 0, which the applied-batch
    # ledger must treat as already-merged (idempotent at-least-once)
    import tempfile

    from big_data_tools_spark.streaming.events import read_events_stream
    from big_data_tools_spark.streaming.upsert import read_rollup, stateless_rollup_sink

    out = tempfile.mkdtemp(prefix="bdt_stateless_replay_")
    stream = read_events_stream(spark, sf_smoke, path_glob="events.parquet")
    q = stateless_rollup_sink(stream, out, keys=["event_type"], query_name="bdt_stateless_first")
    q.awaitTermination()
    before = sorted(map(tuple, read_rollup(spark, out).collect()))
    stream = read_events_stream(spark, sf_smoke, path_glob="events.parquet")
    q = stateless_rollup_sink(stream, out, keys=["event_type"], query_name="bdt_stateless_replay")
    q.awaitTermination()
    after = sorted(map(tuple, read_rollup(spark, out).collect()))
    assert before == after


def test_streaming_rolling_dau_matches_batch_sketch_and_exact_band(
    spark, events_dir, sf_smoke
):
    """The drained sliding-window HLL must BIT-EQUAL the same
    expression run in batch (sketch merge is order-independent), and
    sit within a loose relative-error band of the exact batch
    operator on the days both emit."""
    from big_data_tools_spark.queries import get
    from big_data_tools_spark.streaming.events import rolling_dau_approx

    stream = read_events_stream(spark, events_dir)
    got = {
        (r["win_day"], r["dau_7d_approx"])
        for r in run_available_now(
            rolling_dau_approx(stream), "rolling_dau_test"
        ).collect()
    }
    want = {
        (r["win_day"], r["dau_7d_approx"])
        for r in rolling_dau_approx(load_table(spark, sf_smoke, "events")).collect()
    }
    assert got == want
    assert len(got) > 0

    exact = {
        r["day"]: r["dau_7d"]
        for r in get("events_rolling_dau").fn(spark, sf_smoke).collect()
    }
    approx = dict(got)
    shared = set(exact) & set(approx)
    assert shared, "no overlapping days between exact and streaming DAU"
    for day in shared:
        err = abs(approx[day] - exact[day]) / max(exact[day], 1)
        assert err <= 0.10, f"{day}: approx {approx[day]} vs exact {exact[day]}"


def test_rolling_dau_stream_plan_has_watermark(spark, events_dir):
    from big_data_tools_spark.streaming.events import rolling_dau_approx

    agg = rolling_dau_approx(read_events_stream(spark, events_dir))
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()


def test_rolling_dau_sketch_is_partitioning_independent(spark, sf_smoke):
    """HLL register-max merge is commutative and idempotent, so the
    sketch estimate must be identical under any input partitioning —
    what makes the streaming and batch paths bit-comparable."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.streaming.events import rolling_dau_approx

    events = load_table(spark, sf_smoke, "events")
    base = {tuple(r) for r in rolling_dau_approx(events).collect()}
    shuffled = {
        tuple(r)
        for r in rolling_dau_approx(events.repartition(17, "event_type")).collect()
    }
    one_part = {tuple(r) for r in rolling_dau_approx(events.coalesce(1)).collect()}
    assert base == shuffled == one_part


def test_left_outer_interval_join_null_emission(spark, events_dir, sf_smoke):
    """LEFT OUTER stream-stream join: every drained row must be a
    genuinely unattributed purchase (containment in the batch left
    join), and every unattributed purchase old enough that the final
    watermark has provably passed it must have been emitted — the
    null-emission semantics. Naive stream==batch equality is WRONG
    here: purchases newer than the drain-time watermark stay
    buffered by design."""
    from big_data_tools_spark.streaming.joins import unattributed_purchases

    stream = read_events_stream(spark, events_dir)
    result = run_available_now(
        unattributed_purchases(stream), "unattrib_test", output_mode="append"
    )
    events = load_table(spark, sf_smoke, "events")
    batch = unattributed_purchases(events)
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got <= want  # no false "unattributed" rows, no duplicates
    # completeness behind the watermark horizon: the drain-time
    # watermark trails max ts by the 2h delay TWICE (availableNow
    # commits each batch's watermark one batch late) plus the 1h join
    # window; 7h adds cushion for batch-boundary effects (measured
    # eviction horizon ~6.7h on this fixture)
    import datetime

    from pyspark.sql import functions as F

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=7)
    old_want = {t for t in want if t[2] <= horizon}
    missing = old_want - got
    assert not missing, f"{len(missing)} expired rows never emitted"
    assert len(got) > 0
