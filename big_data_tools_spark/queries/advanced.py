"""Advanced relational surface: semi/anti joins, rollup subtotals (aggregate-only
queries live in advanced_agg.py),
sessionization, array/embedding aggregates (beyond-reference per
SURVEY.md §2.6 — required for a usable analytics engine, each with an
exact DuckDB oracle twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.agg import money_sum, sql_money_sum
from ..io.sources import load_table
from .registry import register


@register(
    "customers_without_orders",
    sql="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Anti join (left_anti): customers with no orders. At scale the "
    "orders side reduces to a distinct-key set before the join.",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "customers_with_urgent_orders",
    sql="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    doc="Semi join (left_semi): customers holding at least one urgent "
    "order; the filter pushes below the join build side.",
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "revenue_rollup",
    sql=f"""
    SELECT n.n_regionkey, c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o.o_totalprice')} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP(n.n_regionkey, c.c_nationkey)
    """,
    doc="Hierarchical subtotals via ROLLUP (region -> nation -> grand "
    "total) — grouping-sets surface absent from the reference (§2.5 "
    "missing-set), one pass over the fact table.",
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return joined.rollup("n_regionkey", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("revenue"),
    )


@register(
    "event_sessions",
    sql="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN date_diff('second',
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                        ts) > 1800
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessioned AS (
        SELECT user_id, ts, event_id,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM marked
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec
    FROM sessioned GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min inactivity) via lag + running "
    "sum windows — the batch form of stateful session windows; one "
    "shuffle on user_id serves both window passes and the final agg.",
)
def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = F.col("ts").cast("long") - prev.cast("long")
    marked = ev.withColumn(
        "new_session", F.when(prev.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sessioned = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts")).cast("long") - F.min(F.col("ts")).cast("long")).alias(
            "duration_sec"
        ),
    )


@register(
    "orders_above_customer_avg",
    sql="""
    WITH scored AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey) AS cust_sum_dec,
               count(o_totalprice) OVER (PARTITION BY o_custkey) AS n_cust_orders
        FROM orders
    )
    SELECT o_orderkey, o_custkey, o_totalprice,
           round(CAST(cust_sum_dec AS DOUBLE), 2) AS cust_sum,
           CAST(n_cust_orders AS BIGINT) AS n_cust_orders
    FROM scored
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n_cust_orders > cust_sum_dec
    """,
    doc="Correlated scalar subquery, decorrelated: 'orders above their "
    "customer's average' as ONE window over the customer key — a "
    "single shuffle, versus the per-row subquery a naive plan would "
    "run. The avg comparison is multiplied through (price*n > sum) so "
    "the boundary decision is exact decimal math, engine-independent.",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    scored = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).alias("cust_sum_dec"),
        F.count("o_totalprice").over(w).alias("n_cust_orders"),
    )
    return scored.filter(
        F.col("o_totalprice").cast("decimal(18,2)") * F.col("n_cust_orders")
        > F.col("cust_sum_dec")
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(F.col("cust_sum_dec").cast("double"), 2).alias("cust_sum"),
        "n_cust_orders",
    )


@register(
    "status_priority_cube",
    sql=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over (status, priority): all 4 grouping combinations in "
    "one pass (Catalyst expands to a single Expand + hash-agg — one "
    "shuffle, not 4 scans). GROUPING() flags disambiguate real nulls "
    "from subtotal rows.",
)
def status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority").agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )


@register(
    "user_value_sliding_1h",
    sql="""
    WITH e AS (
        SELECT event_id, user_id, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events
    )
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2)
               AS value_sum_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    doc="Time-range sliding window (1h trailing per user): "
    "rangeBetween on epoch seconds — the batch twin of a streaming "
    "sliding aggregate; one shuffle on user_id, frames resolved by "
    "sort order. The trailing sum stays in exact decimal so "
    "peers-frame math is engine-independent.",
)
def user_value_sliding_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "user_id", "value", F.col("ts").cast("long").alias("sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"), 2
        ).alias("value_sum_1h"),
    )


@register(
    "customer_spend_deciles",
    sql="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total_spend
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, n_orders, total_spend,
           CAST(ntile(10) OVER (ORDER BY total_spend DESC, o_custkey ASC) AS INT)
               AS decile,
           CAST(dense_rank() OVER (ORDER BY n_orders DESC) AS BIGINT)
               AS order_count_rank
    FROM spend
    """,
    doc="Ranking windows (ntile deciles + dense_rank) over a grouped "
    "rollup; tie-broken on the key so ranks are deterministic. Global "
    "windows range-partition in Spark (single ordering pass, no "
    "single-reducer funnel for the agg itself).",
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("total_spend"),
    )
    w_spend = Window.orderBy(F.col("total_spend").desc(), F.col("o_custkey").asc())
    w_orders = Window.orderBy(F.col("n_orders").desc())
    return spend.select(
        "o_custkey",
        "n_orders",
        "total_spend",
        F.ntile(10).over(w_spend).cast("int").alias("decile"),
        F.dense_rank().over(w_orders).alias("order_count_rank"),
    )


@register(
    "custkey_overlap_setops",
    sql="""
    SELECT 'both' AS bucket, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    UNION ALL
    SELECT 'urgent_only' AS bucket, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    """,
    doc="Set operators (INTERSECT / EXCEPT, both distinct-semantics): "
    "customers placing urgent AND low priority orders vs urgent-only. "
    "Catalyst plans both as aggregated semi/anti joins — one shuffle "
    "each on the compare key.",
)
def custkey_overlap_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    both = urgent.intersect(low).select(F.lit("both").alias("bucket"), "o_custkey")
    only = urgent.subtract(low).select(
        F.lit("urgent_only").alias("bucket"), "o_custkey"
    )
    return both.unionByName(only)


@register(
    "customer_order_coverage",
    sql=f"""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           CASE WHEN c.c_custkey IS NULL THEN 'order_only'
                WHEN o.o_custkey IS NULL THEN 'customer_only'
                ELSE 'both' END AS coverage,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(o.revenue, 0.0) AS revenue
    FROM customer c
    FULL OUTER JOIN (
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               {sql_money_sum('o_totalprice')} AS revenue
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
    doc="Full outer join (the one join kind the reference lacks): "
    "customer dim vs per-customer order rollup, null sides classified "
    "and zero-filled. Aggregating BEFORE the join keeps the outer join "
    "1:1 — no row multiplication, and the shuffle carries one row per "
    "customer instead of one per order.",
)
def customer_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_custkey").isNull(), "customer_only")
        .otherwise("both")
        .alias("coverage"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )
