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
