from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from big_data_tools_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # after both rights
            (2, "u1", _ts("2024-01-01 08:30:00")),  # between rights
            (3, "u1", _ts("2024-01-01 07:00:00")),  # before all rights
            (4, "u2", _ts("2024-01-01 09:00:00")),  # exact-ts tie
            (5, "u3", _ts("2024-01-01 09:00:00")),  # key with no rights
        ],
        "id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 08:00:00"), 10.0),
            ("u1", _ts("2024-01-01 09:00:00"), 20.0),
            ("u2", _ts("2024-01-01 09:00:00"), 30.0),
        ],
        "user string, ts timestamp, v double",
    )
    out = asof_join(
        left, right, on=["user"], value_cols=["v"], matched_ts_col="mts"
    )
    got = {r["id"]: (r["v"], r["mts"]) for r in out.collect()}
    assert got[1] == (20.0, _ts("2024-01-01 09:00:00"))
    assert got[2] == (10.0, _ts("2024-01-01 08:00:00"))
    assert got[3] == (None, None)
    # right row at the same instant is visible (>= semantics)
    assert got[4] == (30.0, _ts("2024-01-01 09:00:00"))
    assert got[5] == (None, None)
    # all left rows survive (left-join semantics)
    assert out.count() == 5


def test_asof_join_preserves_left_columns_and_plan(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"), "x")],
        "id long, user string, ts timestamp, payload string",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:00:00"), 1.5)],
        "user string, ts timestamp, v double",
    )
    out = asof_join(left, right, on=["user"], value_cols=["v"])
    assert set(out.columns) == {"user", "ts", "id", "payload", "v"}
    assert out.collect()[0]["payload"] == "x"
    # one shuffle: exactly one Exchange below the window in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # key exchange (+AQE read), no join exchanges


def test_asof_query_matches_oracle_shape(spark, sf_smoke):
    from big_data_tools_spark.queries import get

    spec = get("purchase_last_click_asof")
    df = spec.fn(spark, sf_smoke)
    assert df.columns == [
        "event_id",
        "user_id",
        "purchase_value",
        "click_value",
        "click_ts",
    ]
    assert df.count() > 0
    assert df.filter(F.col("click_ts").isNotNull()).count() > 0


def test_resample_ffill_semantics(spark):
    from big_data_tools_spark.operators.resample import resample_ffill

    df = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:30:00"), 1.0),   # bucket 00:00
            ("u1", _ts("2024-01-01 03:10:00"), 5.0),   # bucket 03:00 (gap 01,02)
            ("u1", _ts("2024-01-01 03:40:00"), 4.0),   # same bucket: max wins
            ("u2", _ts("2024-01-01 10:00:00"), 9.0),   # single point
        ],
        "k string, ts timestamp, v double",
    )
    out = resample_ffill(df, "k", "ts", "v", step_sec=3600)
    rows = {(r["k"], r["grid_sec"]): r["v"] for r in out.collect()}
    base = int(_ts("2024-01-01 00:00:00").replace(tzinfo=dt.timezone.utc).timestamp())
    # u1: 4 hourly points 00..03, gaps forward-filled from 00:00's value
    assert rows[("u1", base)] == 1.0
    assert rows[("u1", base + 3600)] == 1.0
    assert rows[("u1", base + 7200)] == 1.0
    assert rows[("u1", base + 10800)] == 5.0  # max of the two in-bucket obs
    # u2: single grid point
    u2 = [(k, s) for (k, s) in rows if k == "u2"]
    assert len(u2) == 1
    assert len(rows) == 5
