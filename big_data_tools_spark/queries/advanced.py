"""Advanced relational surface: semi/anti joins, rollup subtotals,
sessionization, array/embedding aggregates (beyond-reference per
SURVEY.md §2.6 — required for a usable analytics engine, each with an
exact DuckDB oracle twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.agg import dmean, dsum, money_sum, sql_dmean, sql_dsum, sql_money_sum
from ..io.sources import load_table
from ..operators.partitioning import fan_out
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
    "embedding_centroids",
    sql=f"""
    WITH flat AS (
        SELECT label,
               generate_subscripts(embedding, 1) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings
    )
    SELECT label, CAST(pos AS INT) AS pos,
           {sql_dmean('v', 4)} AS centroid_v
    FROM flat WHERE pos <= 8 GROUP BY label, pos
    """,
    doc="Per-label embedding centroid (first 8 dims, long form) via "
    "posexplode + grouped mean — array aggregation without UDFs; the "
    "wide->long explode shuffles once on (label, pos).",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), "vec_id")
    flat = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v"),
    ).withColumn("pos", (F.col("pos0") + 1).cast("int")).filter(F.col("pos") <= 8)
    return flat.groupBy("label", "pos").agg(dmean(F.col("v"), 4).alias("centroid_v"))


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
    "frequent_big_spenders",
    sql=f"""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 10
       AND sum(CAST(o_totalprice AS DECIMAL(18,2))) > 1500000
    """,
    doc="HAVING surface: post-aggregation predicate on both count and "
    "exact decimal sum; Catalyst plans it as filter-above-agg with the "
    "partial agg still map-side.",
)
def frequent_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend_dec"),
        )
        .filter((F.col("n_orders") >= 10) & (F.col("spend_dec") > 1500000))
        .select(
            "o_custkey",
            "n_orders",
            F.round(F.col("spend_dec").cast("double"), 2).alias("total_spend"),
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
    "doc_length_quantiles",
    sql="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 2) AS p50,
           round(quantile_cont(n_chars, 0.9), 2) AS p90,
           round(quantile_cont(n_chars, 0.99), 2) AS p99
    FROM documents GROUP BY source
    """,
    doc="Exact interpolated percentiles of document length per source "
    "(Spark `percentile` == DuckDB `quantile_cont`, both exact "
    "interpolation — deterministic across engines). The 100 TB path "
    "swaps in approx_percentile (t-digest, one pass, mergeable) — "
    "exposed as doc_length_quantiles_approx (rows-only: sketch "
    "internals differ engine to engine).",
)
def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("n_chars", 0.5), 2).alias("p50"),
        F.round(F.percentile("n_chars", 0.9), 2).alias("p90"),
        F.round(F.percentile("n_chars", 0.99), 2).alias("p99"),
    )


@register(
    "doc_length_quantiles_approx",
    sql=None,  # approx sketches are engine-specific by design
    doc="approx_percentile twin of doc_length_quantiles: single-pass "
    "mergeable sketch, the correct choice at 100 TB where exact "
    "percentile would sort each group. Accuracy band vs the exact "
    "form asserted in tests/test_scale_ops.py. The sketch's "
    "array<double> result is projected to scalar p50/p90/p99 columns "
    "(same shape as the exact twin) — downstream row canonicalizers "
    "can't sort/hash list-valued cells.",
)
def doc_length_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_percentile("n_chars", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000).alias(
            "q"
        ),
    )
    return agg.select(
        "source",
        "n_docs",
        F.element_at("q", 1).cast("double").alias("p50"),
        F.element_at("q", 2).cast("double").alias("p90"),
        F.element_at("q", 3).cast("double").alias("p99"),
    )


@register(
    "event_value_stats",
    sql="""
    WITH s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                    AS DOUBLE) AS sxx
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round(sx / n, 2) AS mean_value,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_value
    FROM s
    """,
    doc="Mean/stddev per event_type from EXACT decimal sums (sum x, "
    "sum x^2 are associative in decimal, so results are partition- "
    "order and engine independent; the double math after aggregation "
    "is identical IEEE on identical inputs). The naive "
    "round(stddev_samp(double)) would differ in final ulps between "
    "engines.",
)
def event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sxx"),
    )
    return s.select(
        "event_type",
        "n",
        F.round(F.col("sx") / F.col("n"), 2).alias("mean_value"),
        F.round(
            F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)),
            4,
        ).alias("stddev_value"),
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


@register(
    "lineitem_metric_unpivot",
    sql="""
    WITH long_form AS (
        SELECT 'quantity' AS metric, l_quantity AS v FROM lineitem
        UNION ALL
        SELECT 'extendedprice' AS metric, l_extendedprice AS v FROM lineitem
        UNION ALL
        SELECT 'discount' AS metric, l_discount AS v FROM lineitem
    )
    SELECT metric,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
           round(min(v), 2) AS min_v,
           round(max(v), 2) AS max_v
    FROM long_form GROUP BY metric
    """,
    doc="Wide->long unpivot (melt; the scale-correct form of the "
    "reference's per-column loops P7): Spark unpivot/stack emits all "
    "metrics in ONE scan pass — the UNION ALL oracle twin scans three "
    "times, which is exactly the rewrite this operator exists to "
    "avoid at 100 TB.",
)
def lineitem_metric_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long_form = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="v",
    ).withColumn("metric", F.regexp_replace("metric", "^l_", ""))
    return long_form.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("v").cast("decimal(18,2)")).cast("double"), 2).alias("total"),
        F.round(F.min("v"), 2).alias("min_v"),
        F.round(F.max("v"), 2).alias("max_v"),
    )


@register(
    "segment_revenue_share",
    sql="""
    WITH seg AS (
        SELECT c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    )
    SELECT segment, n_orders,
           round(CAST(rev_dec AS DOUBLE), 2) AS revenue,
           round(CAST(rev_dec AS DOUBLE)
                 / CAST(sum(rev_dec) OVER () AS DOUBLE), 4) AS revenue_share
    FROM seg
    """,
    doc="Share-of-total via an empty-frame window over the aggregated "
    "rollup: the total rides a window on ~5 segment rows, not a "
    "second scan or a driver collect. Ratio computed from exact "
    "decimal sums (identical IEEE division on identical inputs), so "
    "the share survives the cross-engine hash check.",
)
def segment_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
        )
    )
    w = Window.partitionBy()
    return seg.select(
        "segment",
        "n_orders",
        F.round(F.col("rev_dec").cast("double"), 2).alias("revenue"),
        F.round(
            F.col("rev_dec").cast("double") / F.sum("rev_dec").over(w).cast("double"), 4
        ).alias("revenue_share"),
    )


@register(
    "returnflag_price_corr",
    sql="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
               sum(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
               sum(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(CAST(sx AS DOUBLE) / n, 2) AS avg_qty,
           round(CAST(sy AS DOUBLE) / n, 2) AS avg_price,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                 / (n - 1), 2) AS covar_qty_price,
           round((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(n * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS corr_qty_price
    FROM s
    """,
    doc="Grouped Pearson correlation + sample covariance from exact "
    "decimal moment sums (n, Σx, Σy, Σx², Σy², Σxy): the five sums "
    "accumulate in decimal so they are order-independent across "
    "engines, then the closed-form corr/covar is one identical IEEE "
    "expression on both sides — no native corr()/covar_samp(), whose "
    "running-update summation order is engine-specific. Map-side "
    "partial aggregation applies; one shuffle on l_returnflag.",
)
def returnflag_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(18,2)")
    pd_ = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qd).alias("sx"),
        F.sum(pd_).alias("sy"),
        F.sum(qd * qd).alias("sxx"),
        F.sum(pd_ * pd_).alias("syy"),
        F.sum(qd * pd_).alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return s.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 2).alias("avg_qty"),
        F.round(sy / n, 2).alias("avg_price"),
        F.round((sxy - sx * sy / n) / (n - 1), 2).alias("covar_qty_price"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
    )


@register(
    "status_priority_mode",
    sql="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ), r AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                   ORDER BY n_orders DESC, o_orderpriority) AS rn
        FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS priority_mode, n_orders
    FROM r WHERE rn = 1
    """,
    doc="Grouped mode (most frequent value): count-then-rank with a "
    "lexical tie-break, the distributed form of mode() — two "
    "map-side-combining aggregations, never a per-group collect. "
    "Deterministic under ties, unlike native mode().",
)
def status_priority_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n_orders"), F.asc("o_orderpriority")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("priority_mode"),
            "n_orders",
        )
    )


@register(
    "discount_band_histogram",
    sql=f"""
    SELECT CAST(round(l_discount * 100) AS INT) AS band_pct,
           CAST(count(*) AS BIGINT) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    GROUP BY band_pct
    """,
    doc="Equi-width histogram: discount banded into 1% bins (scaled "
    "rounding — floor/width_bucket on 2-decimal doubles is "
    "fp-boundary-unstable, round is exact) with per-band row count "
    "and exact-decimal revenue. Single-pass distributed histogram: "
    "no per-band scans, no driver-side binning.",
)
def discount_band_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.select(
            F.round(F.col("l_discount") * 100).cast("int").alias("band_pct"),
            rev.alias("rev"),
        )
        .groupBy("band_pct")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum(F.col("rev")).alias("revenue"))
    )
