"""Data-distribution diagnostics queries: key-skew reports (the
measurement side of the engine's salting/AQE story) and k-anonymity
auditing (the privacy gate a training-data release pipeline runs
before export).

All three are thin demos over ``operators/skewstats.py``; scale notes
live on the operator docstrings (one fact shuffle; every window runs
over an already-aggregated tiny frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from ..operators.skewstats import heavy_hitters, kanonymity_violations, skew_summary
from .registry import register

_TOP_N = 10
_KANON_K = 8


@register(
    "orders_custkey_skew",
    sql=f"""
    WITH counts AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_custkey
    ), sizes AS (
        SELECT cnt, CAST(count(*) AS BIGINT) AS m FROM counts GROUP BY cnt
    ), g AS (
        SELECT cnt, m,
               COALESCE(sum(m) OVER (ORDER BY cnt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_m
        FROM sizes
    ), base AS (
        SELECT CAST(sum(m) AS BIGINT) AS n_keys,
               CAST(sum(cnt * m) AS BIGINT) AS n_rows,
               max(cnt) AS max_cnt,
               sum(cnt * (m * cum_m + m * (m + 1) / 2.0)) AS rw
        FROM g
    ), topn AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS topn_rows FROM (
            SELECT cnt FROM counts
            ORDER BY cnt DESC, o_custkey ASC LIMIT {_TOP_N}
        )
    )
    SELECT n_keys, n_rows,
           round(max_cnt * 1.0 / n_rows, 6) AS max_share,
           round(topn_rows * 1.0 / n_rows, 6) AS topn_share,
           round(2.0 * rw / (n_keys * n_rows)
                 - (n_keys + 1.0) / n_keys, 6) AS gini
    FROM base CROSS JOIN topn
    """,
    doc="Key-skew summary for orders.o_custkey (operators/skewstats.py "
    "skew_summary): n_keys/n_rows/max_share/top10_share plus an EXACT "
    "Gini coefficient computed from the group-size histogram — tied "
    "counts occupy a contiguous rank run whose rank sum is closed-form, "
    "so no global per-key sort ever happens (the window runs over "
    "|distinct sizes| rows). The report a planner consults before "
    "choosing broadcast/salt/AQE for a join on this key.",
)
def orders_custkey_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return skew_summary(orders, ["o_custkey"], top_n=_TOP_N)


@register(
    "events_user_heavy_hitters",
    sql=f"""
    WITH counts AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ), tot AS (SELECT sum(cnt) AS total FROM counts)
    SELECT user_id, cnt,
           round(cnt * 1.0 / t.total, 6) AS share,
           CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS BIGINT)
               AS rank
    FROM counts CROSS JOIN tot t
    ORDER BY cnt DESC, user_id ASC LIMIT {_TOP_N}
    """,
    doc="Top-10 heaviest event producers with share-of-total "
    "(operators/skewstats.py heavy_hitters): grouped count, broadcast "
    "1-row total, TakeOrderedAndProject for the cut, rank over the "
    "10 survivors only.",
)
def events_user_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return heavy_hitters(events, ["user_id"], top_n=_TOP_N)


@register(
    "customer_kanonymity",
    sql=f"""
    SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    HAVING count(*) < {_KANON_K}
    """,
    doc="k-anonymity audit (Sweeney) on the (nation, segment) "
    "quasi-identifier pair: combinations shared by fewer than k=8 "
    "customers, i.e. the groups a data release would re-identify. One "
    "grouped count + HAVING (operators/skewstats.py "
    "kanonymity_violations); nulls count as quasi-identifier values.",
)
def customer_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return kanonymity_violations(
        customer, ["c_nationkey", "c_mktsegment"], k=_KANON_K
    )


@register(
    "lang_source_chi2",
    sql="""
    WITH obs AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source
    ), rt AS (
        SELECT lang, sum(o) AS row_tot FROM obs GROUP BY lang
    ), ct AS (
        SELECT source, sum(o) AS col_tot FROM obs GROUP BY source
    ), tot AS (SELECT sum(o) AS n FROM obs),
    cells AS (
        SELECT o.o,
               rt.row_tot * ct.col_tot * 1.0 / t.n AS e
        FROM obs o
        JOIN rt USING (lang)
        JOIN ct USING (source)
        CROSS JOIN tot t
    )
    SELECT round(CAST(sum(CAST(round((o - e) * (o - e) / e, 6)
                             AS DECIMAL(28,8))) AS DOUBLE), 4) AS chi2,
           CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
               * CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof,
           CAST((SELECT n FROM tot) AS BIGINT) AS n_docs
    FROM cells
    """,
    doc="Chi-square independence test on the (lang, source) "
    "contingency table — the dataset-composition drift check a corpus "
    "pipeline runs before/after a refresh (is language mix independent "
    "of source?). Observed/expected from ONE grouped count plus two "
    "marginal rollups of the ALREADY-AGGREGATED cells (|langs| + "
    "|sources| rows) broadcast back; the statistic sums "
    "quantized-decimal cell contributions, so it is partition-order "
    "and engine independent. Compare chi2 against the chi2(dof) "
    "critical value offline.",
)
def lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import track_cache

    docs = load_table(spark, sf_dir, "documents")
    # the contingency table is |langs x sources| rows; persist it so
    # the marginals, total, dof, and cells all branch off ONE scan of
    # documents instead of five (PLANS.md caught the recompute)
    obs = (
        docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o")).persist()
    )
    rt = obs.groupBy("lang").agg(F.sum("o").alias("row_tot"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("col_tot"))
    tot = obs.agg(F.sum("o").alias("n"))

    cells = (
        obs.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "o",
            (F.col("row_tot") * F.col("col_tot") * F.lit(1.0) / F.col("n")).alias(
                "e"
            ),
        )
    )
    contrib = F.round(
        (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"), 6
    ).cast("decimal(28,8)")
    dof = (
        rt.agg(F.count(F.lit(1)).alias("r"))
        .crossJoin(ct.agg(F.count(F.lit(1)).alias("c")))
        .select(((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"))
    )
    stat = cells.agg(
        F.round(F.sum(contrib).cast("double"), 4).alias("chi2"),
    )
    out = (
        stat.crossJoin(F.broadcast(dof))
        .crossJoin(F.broadcast(tot.select(F.col("n").cast("bigint").alias("n_docs"))))
        .select("chi2", "dof", "n_docs")
    )
    return track_cache(out, obs)


_GAP_MIN_EVENTS = 10


@register(
    "events_daily_completeness",
    sql=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ), bounds AS (
        SELECT min(day) AS d0, max(day) AS d1 FROM daily
    ), spine AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds
    )
    SELECT s.day, COALESCE(d.n_events, 0) AS n_events,
           CASE WHEN d.day IS NULL THEN 'missing'
                WHEN d.n_events < {_GAP_MIN_EVENTS} THEN 'sparse'
                ELSE 'ok' END AS status
    FROM spine s LEFT JOIN daily d USING (day)
    WHERE d.day IS NULL OR d.n_events < {_GAP_MIN_EVENTS}
    """,
    doc="Ingestion-completeness report: a full date spine from the "
    "observed min/max day (explode of sequence() over a broadcast "
    "1-row bounds aggregate — no calendar table needed), left-joined "
    "against per-day counts; days missing entirely or below the "
    "expected floor surface as gaps. The freshness/continuity check "
    "that catches a dead upstream BEFORE a refresh trains on a "
    "truncated corpus. Per-day rollup is one shuffle; the spine is "
    "O(days) rows.",
)
def events_daily_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import track_cache

    events = load_table(spark, sf_dir, "events")
    # day-grain frame (O(days) rows): persist so the bounds aggregate
    # and the spine join share one scan of events
    daily = (
        events.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .persist()
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    joined = spine.join(daily, "day", "left_outer")
    status = (
        F.when(F.col("n_events").isNull(), F.lit("missing"))
        .when(F.col("n_events") < _GAP_MIN_EVENTS, F.lit("sparse"))
        .otherwise(F.lit("ok"))
    )
    out = (
        joined.select(
            "day",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            status.alias("status"),
        )
        .filter(F.col("status") != "ok")
    )
    return track_cache(out, daily)
