"""Temporal-join queries over the events table: as-of (point-in-time)
join — beyond the reference (its time handling is batch snapshot
deltas, SURVEY.md §2.10) but core to event/feature-store workloads.
DuckDB's native ASOF JOIN is the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from ..operators.asof import asof_join
from .registry import register


@register(
    "purchase_last_click_asof",
    sql="""
    WITH clicks AS (
        SELECT user_id, ts, round(max(value), 2) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), purch AS (
        SELECT event_id, user_id, ts, round(value, 2) AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.purchase_value,
           c.click_value, c.ts AS click_ts
    FROM purch p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="Backward as-of join (operators/asof.py): each purchase event "
    "gets the user's most recent at-or-before click. Encoded as "
    "union + window last(ignorenulls) — ONE shuffle on user_id, no "
    "range nested-loop join; right side pre-aggregated to unique "
    "(user, ts) so the tie-break is deterministic. Oracle: DuckDB "
    "native ASOF LEFT JOIN.",
)
def purchase_last_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("click_value"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("purchase_value")
    )
    return asof_join(
        purch,
        clicks,
        on=["user_id"],
        value_cols=["click_value"],
        matched_ts_col="click_ts",
    ).select("event_id", "user_id", "purchase_value", "click_value", "click_ts")


@register(
    "user_value_hourly_ffill",
    sql="""
    WITH obs AS (
        SELECT user_id AS k,
               CAST((CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS BIGINT) AS sec,
               max(value) AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ), spans AS (
        SELECT k, min(sec) AS lo, max(sec) AS hi FROM obs GROUP BY k
    ), grid AS (
        SELECT k, unnest(range(lo, hi + 3600, 3600)) AS sec FROM spans
    )
    SELECT g.k AS user_id, g.sec AS grid_sec,
           round(last_value(o.v IGNORE NULLS) OVER (
               PARTITION BY g.k ORDER BY g.sec
               ROWS UNBOUNDED PRECEDING), 2) AS value
    FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.sec = o.sec
    """,
    doc="Time-series resample + forward fill (operators/resample.py — "
    "the pandas resample/ffill equivalent Spark lacks): per-user "
    "hourly grid generated executor-side (sequence+explode), "
    "purchase values forward-filled with last(ignorenulls) — one "
    "shuffle on user_id. Grid buckets floor-align so both engines "
    "agree exactly.",
)
def user_value_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.resample import resample_ffill

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    out = resample_ffill(ev, "user_id", "ts", "value", step_sec=3600)
    return out.select("user_id", "grid_sec", F.round("value", 2).alias("value"))


@register(
    "purchase_click_window",
    sql="""
    WITH purch AS (
        SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS psec
        FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS csec, value
        FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           CAST(count(c.csec) AS BIGINT) AS n_clicks_1h,
           round(CAST(coalesce(sum(CAST(c.value AS DECIMAL(18,2))), 0)
                 AS DOUBLE), 2) AS click_value_1h
    FROM purch p LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.csec BETWEEN p.psec - 3600 AND p.psec
    GROUP BY p.event_id, p.user_id
    """,
    doc="Interval join (operators/rangejoin.py): clicks in the hour "
    "before each purchase, same user. Bucketed banding turns the "
    "range predicate into a hash equi-join on (user, hour-bucket) "
    "with a 2x left explode — no per-key cross product on hot users, "
    "unlike the naive keys-then-filter plan. Trailing sum in exact "
    "decimal so both engines agree.",
)
def purchase_click_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), "value"
    )
    pairs = range_join(
        purch, clicks, on=["user_id"], left_ts="ts", right_ts="cts",
        lo_sec=-3600, hi_sec=0,
    )
    counts = pairs.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_clicks_1h"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v_dec"),
    )
    out = purch.join(counts, on=["event_id", "user_id"], how="left").select(
        "event_id",
        "user_id",
        F.coalesce("n_clicks_1h", F.lit(0)).alias("n_clicks_1h"),
        F.round(
            F.coalesce(F.col("v_dec"), F.lit(0).cast("decimal(18,2)")).cast(
                "double"
            ),
            2,
        ).alias("click_value_1h"),
    )
    from ..operators.cache import track_cache

    return track_cache(out, pairs)  # re-tag: groupBy/join drop the tag


@register(
    "event_funnel",
    sql="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_signup) AS BIGINT) AS stage_signup,
           CAST(count(CASE WHEN t_click > t_signup THEN 1 END) AS BIGINT)
               AS stage_click_after_signup,
           CAST(count(CASE WHEN t_purchase > t_click AND t_click > t_signup
                           THEN 1 END) AS BIGINT)
               AS stage_full_funnel
    FROM firsts
    """,
    doc="Ordered conversion funnel (signup -> click -> purchase) via "
    "conditional-min first-touch times + ordered comparisons — one "
    "shuffle on user_id, no self-joins per stage (the naive funnel "
    "joins events N times). Null first-touches drop out of the "
    "comparisons naturally.",
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_of(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("stage_signup"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1)).alias(
            "stage_click_after_signup"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            )
        ).alias("stage_full_funnel"),
    )


@register(
    "events_multires_rollup",
    sql="""
    WITH e AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               value
        FROM events
    )
    SELECT day, hour,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS value_sum,
           CAST(GROUPING(hour) AS INT) AS g_hour
    FROM e GROUP BY GROUPING SETS ((day), (day, hour))
    """,
    doc="Multi-resolution time rollup (the hypertable "
    "continuous-aggregate shape): hourly and daily aggregates of the "
    "event stream in ONE pass via GROUPING SETS — Spark expands the "
    "sets before the exchange, so partial aggregation still combines "
    "map-side and the fact table is scanned once, not once per "
    "resolution. GROUPING(hour) disambiguates the day-level rows. "
    "Value sums in exact decimal (functions/agg.py policy).",
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.agg import money_sum

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    return e.groupingSets([["day"], ["day", "hour"]], "day", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum(F.col("value")).alias("value_sum"),
        F.grouping("hour").cast("int").alias("g_hour"),
    )


@register(
    "event_sessions_builtin",
    sql="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessioned AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessioned GROUP BY user_id, sid
    """,
    doc="Sessionization via Spark's NATIVE session_window aggregation — "
    "the built-in scale path beside the lag-window batch form "
    "(event_sessions) and the custom stateful streaming operator "
    "(streaming_sessions). One shuffle; dynamic-gap merging happens "
    "inside the aggregation operator, and the same expression streams "
    "with a watermark unchanged. Boundary semantics differ from the "
    "lag form: a gap of EXACTLY the 30-min threshold starts a new "
    "session here (window end is last-event + gap, exclusive), which "
    "the oracle twin mirrors with >= in the lag test.",
)
def event_sessions_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
