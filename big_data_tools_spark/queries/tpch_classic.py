"""Classic TPC-H-shaped decision-support queries (Q11/Q15/Q17/Q18/Q22
analogs restricted to the columns the driver testdata carries).

These widen the relational family with the correlated-subquery shapes
the reference's users write ad hoc (SURVEY.md §2.2-§2.6 generalized):
each correlated scalar subquery is re-expressed Spark-first as a
pre-aggregation + join (Catalyst de-correlates SQL subqueries the same
way; stating the join explicitly keeps the plan visible and lets us
broadcast the small side deliberately).

Scale notes per query in the docstrings. Float policy: all double
aggregates go through functions/agg (exact decimal sums — order- and
engine-independent); per-row double arithmetic is bit-identical across
engines, so threshold comparisons are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.agg import dsum, money_sum, sql_dsum, sql_money_sum
from ..io.sources import load_table
from .registry import register

_Q17_BRAND = "Brand#11"
_Q15_START, _Q15_END = "1996-01-01", "1996-04-01"
_Q18_MIN_QTY = 250
_Q11_FRACTION = 0.001


@register(
    "small_qty_part_revenue",
    sql=f"""
    WITH branded AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = '{_Q17_BRAND}'
    ), part_avg AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / count(l_quantity) AS avg_qty
        FROM branded GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(b.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 2) AS avg_weekly_revenue,
           CAST(count(*) AS BIGINT) AS n_small_qty_lines
    FROM branded b JOIN part_avg a ON b.l_partkey = a.l_partkey
    WHERE b.l_quantity < 0.2 * a.avg_qty
    """,
    doc="TPC-H Q17 shape: revenue lost to small-quantity orders of one "
    "brand. The correlated per-part avg(l_quantity) subquery is "
    "rewritten as pre-aggregate + equi-join; the brand filter is "
    "applied FIRST via a broadcast join so the per-part averages are "
    "computed over the pruned fact rows only (at 100 TB the brand "
    "predicate keeps ~1/25 of parts; computing averages for all parts "
    "first would waste a full-fact shuffle). Exact decimal average so "
    "the 0.2*avg threshold is engine-deterministic.",
)
def small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    branded_parts = part.filter(F.col("p_brand") == _Q17_BRAND).select("p_partkey")
    branded = lineitem.join(
        F.broadcast(branded_parts),
        lineitem.l_partkey == branded_parts.p_partkey,
    ).select("l_partkey", "l_quantity", "l_extendedprice")

    part_avg = branded.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("l_quantity")
        ).alias("avg_qty")
    )
    small = branded.join(part_avg, "l_partkey").filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0,
            2,
        ).alias("avg_weekly_revenue"),
        F.count(F.lit(1)).alias("n_small_qty_lines"),
    )


@register(
    "top_volume_orders",
    sql=f"""
    WITH big AS (
        SELECT l_orderkey, {sql_money_sum('l_quantity')} AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING {sql_money_sum('l_quantity')} > {_Q18_MIN_QTY}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 shape (large-volume orders): group lineitem by "
    "order, keep orders above a quantity threshold, graft order and "
    "customer attributes. The HAVING filter runs on the aggregated "
    "(small) side before both joins, so at scale the ORDER/CUSTOMER "
    "joins see only the surviving keys — AQE broadcasts the filtered "
    "agg; no limit, so the result set is deterministic.",
)
def top_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    big = (
        lineitem.groupBy("l_orderkey")
        .agg(money_sum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


@register(
    "top_revenue_supplier",
    sql=f"""
    WITH rev AS (
        SELECT l_suppkey,
               {sql_dsum("l_extendedprice * (1.0 - l_discount)")} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q15_START}'
          AND l_shipdate <  TIMESTAMP '{_Q15_END}'
        GROUP BY l_suppkey
    ), mx AS (SELECT max(total_rev) AS max_rev FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r CROSS JOIN mx
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = mx.max_rev
    """,
    doc="TPC-H Q15 shape (top supplier by quarterly revenue): "
    "per-supplier revenue in a ship-date window, then the max-revenue "
    "supplier(s) including ties. The scalar max stays distributed — a "
    "1-row aggregate broadcast-cross-joined onto the grouped frame "
    "(the §4.3 collect-free pattern); revenue is an exact decimal sum "
    "so the tie comparison is deterministic. The date filter pushes "
    "down to the parquet scan.",
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scalar import with_global_max

    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")

    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(_Q15_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q15_END).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias(
                "total_rev"
            )
        )
    )
    top = with_global_max(rev, F.col("total_rev"), "max_rev").filter(
        F.col("total_rev") == F.col("max_rev")
    )
    return top.join(
        F.broadcast(supplier), top.l_suppkey == supplier.s_suppkey
    ).select("s_suppkey", "s_name", "total_rev")


@register(
    "supplier_value_concentration",
    sql=f"""
    WITH per_supp AS (
        SELECT l_suppkey,
               {sql_dsum("l_extendedprice * (1.0 - l_discount)")} AS supp_value
        FROM lineitem GROUP BY l_suppkey
    ), tot AS (
        SELECT CAST(sum(CAST(supp_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM per_supp
    )
    SELECT p.l_suppkey AS s_suppkey, p.supp_value,
           round(p.supp_value / t.total_value, 6) AS value_share
    FROM per_supp p CROSS JOIN tot t
    WHERE p.supp_value > {_Q11_FRACTION} * t.total_value
    """,
    doc="TPC-H Q11 shape (value concentration): suppliers whose "
    "discounted lineitem value exceeds a fraction of the global total. "
    "The global scalar is a 1-row aggregate over the ALREADY-GROUPED "
    "per-supplier frame (|suppliers| rows, not |lineitem|), broadcast "
    "back — two shuffles total, no driver collect. Sums are exact "
    "decimals at every level, so the fraction threshold and the share "
    "division are engine-deterministic.",
)
def supplier_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")

    per_supp = (
        lineitem.groupBy("l_suppkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias(
                "supp_value"
            )
        )
    )
    tot = per_supp.agg(
        F.sum(F.col("supp_value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value")
    )
    return (
        per_supp.crossJoin(F.broadcast(tot))
        .filter(F.col("supp_value") > _Q11_FRACTION * F.col("total_value"))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "supp_value",
            F.round(F.col("supp_value") / F.col("total_value"), 6).alias("value_share"),
        )
    )


@register(
    "idle_rich_customers",
    sql="""
    WITH pos_avg AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(c_acctbal) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_custs,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) + 0.0
               AS total_bal
    FROM customer c CROSS JOIN pos_avg a
    WHERE c.c_acctbal > a.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape (idle high-balance customers, acctbal "
    "variant): customers above the positive-balance average with no "
    "URGENT orders, counted per nation. The scalar subquery is a "
    "1-row broadcast; the NOT EXISTS is a left-anti join on a "
    "pre-filtered orders projection (the priority predicate pushes "
    "to the scan and the anti join shuffles 8 bytes/row); exact "
    "decimal average makes the balance threshold "
    "engine-deterministic.",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    pos_avg = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    rich = customer.crossJoin(F.broadcast(pos_avg)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    idle = rich.join(urgent, rich.c_custkey == F.col("o_custkey"), "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        money_sum(F.col("c_acctbal")).alias("total_bal"),
    )


_TRADE_BALANCE_SQL = f"""
    WITH cust_rev AS (
        SELECT c.c_nationkey AS nationkey,
               {sql_money_sum('o.o_totalprice')} AS buy_value
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    ), supp_rev AS (
        SELECT s.s_nationkey AS nationkey,
               {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS sell_value
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_nationkey
    )
    SELECT n.n_name, b.buy_value, s.sell_value,
           round(b.buy_value - s.sell_value, 2) + 0.0 AS trade_balance
    FROM nation n
    JOIN cust_rev b ON n.n_nationkey = b.nationkey
    JOIN supp_rev s ON n.n_nationkey = s.nationkey
"""


@register(
    "nation_trade_balance_sql",
    sql=_TRADE_BALANCE_SQL,
    doc="SQL front-end surface (S-family): the SAME SQL text runs "
    "through spark.sql() over temp views AND through the DuckDB "
    "oracle — zero dialect divergence (decimal-sum float policy "
    "included), demonstrating that users of the reference can bring "
    "ad-hoc SQL untouched. Catalyst plans it like the DataFrame "
    "equivalents: two grouped aggregates joined onto the broadcast "
    "nation dim.",
)
def nation_trade_balance_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer", "lineitem", "supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TRADE_BALANCE_SQL)


_Q19_TIERS = [
    ("Brand#12", 1, 15, 1, 15),
    ("Brand#23", 1, 25, 10, 30),
    ("Brand#3", 10, 40, 20, 45),
]


def _q19_sql_pred() -> str:
    ors = [
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {s0} AND {s1}"
        f" AND l.l_quantity BETWEEN {q0} AND {q1})"
        for b, s0, s1, q0, q1 in _Q19_TIERS
    ]
    return " OR ".join(ors)


@register(
    "promo_revenue_multibrand",
    sql=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {_q19_sql_pred()}
    """,
    doc="TPC-H Q19 shape: disjunction of per-brand (size-range x "
    "quantity-range) tiers. The part side is pre-filtered to the three "
    "brands and broadcast, so the OR-of-ANDs runs as a residual "
    "predicate on broadcast-hash join probes — no shuffle of lineitem "
    "at any scale; only the brand membership (a single IN) prunes the "
    "dim before the join. The quantity half of each tier stays on the "
    "fact side where the parquet reader can min/max-skip row groups.",
)
def promo_revenue_multibrand(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    brands = [t[0] for t in _Q19_TIERS]
    dim = part.filter(F.col("p_brand").isin(brands)).select(
        "p_partkey", "p_brand", "p_size"
    )
    tier = None
    for b, s0, s1, q0, q1 in _Q19_TIERS:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s0, s1)
            & F.col("l_quantity").between(q0, q1)
        )
        tier = c if tier is None else (tier | c)
    joined = lineitem.join(
        F.broadcast(dim), lineitem.l_partkey == dim.p_partkey
    ).filter(tier)
    return joined.agg(
        dsum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q4_LATE_DAYS = 30


@register(
    "late_ship_priority_counts",
    sql=f"""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY
    )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: orders with at least one line shipped more "
    "than 30 days after the order date, counted per priority. The "
    "correlated EXISTS runs as a LEFT SEMI hash join on o_orderkey "
    "with the date comparison as the residual condition — the semi "
    "join dedups matches inside the join operator, so no distinct is "
    "needed and each order flows through at most once regardless of "
    "how many late lines it has.",
)
def late_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    cond = (orders.o_orderkey == lineitem.l_orderkey) & (
        lineitem.l_shipdate
        > orders.o_orderdate + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAYS")
    )
    late = orders.join(lineitem, cond, "left_semi")
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "waiting_supplier_lines",
    sql="""
    WITH per_supp AS (
        SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    ), windowed AS (
        SELECT l_orderkey, l_suppkey, smax,
               max(smax) OVER (PARTITION BY l_orderkey) AS gmax,
               count(*) OVER (PARTITION BY l_orderkey) AS n_supp
        FROM per_supp
    ), ranked AS (
        SELECT *,
               sum(CASE WHEN smax = gmax THEN 1 ELSE 0 END)
                   OVER (PARTITION BY l_orderkey) AS n_at_max
        FROM windowed
    )
    SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM ranked r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.smax = r.gmax AND r.n_at_max = 1 AND r.n_supp > 1
    GROUP BY s.s_suppkey, s.s_name
    """,
    doc="TPC-H Q21 shape: on multi-supplier orders, the supplier whose "
    "lines shipped strictly last (sole latecomer). The classic "
    "EXISTS + NOT EXISTS double self-join on the fact table is "
    "rewritten as ONE grouped aggregate to (order, supplier) grain "
    "plus window functions over the order — the fact table shuffles "
    "once on l_orderkey instead of three times, and the 'strictly "
    "later than every other supplier' condition becomes unique-max "
    "arithmetic (n_at_max = 1) instead of an anti join.",
)
def waiting_supplier_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")

    per_supp = lineitem.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("smax")
    )
    w = Window.partitionBy("l_orderkey")
    ranked = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "smax",
        F.max("smax").over(w).alias("gmax"),
        F.count(F.lit(1)).over(w).alias("n_supp"),
    ).withColumn(
        "n_at_max",
        F.sum(F.when(F.col("smax") == F.col("gmax"), 1).otherwise(0)).over(w),
    )
    sole_late = ranked.filter(
        (F.col("smax") == F.col("gmax"))
        & (F.col("n_at_max") == 1)
        & (F.col("n_supp") > 1)
    )
    return (
        sole_late.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            sole_late.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q8_REGION = "EUROPE"
_Q8_NATION = "NATION_7"


@register(
    "nation_market_share",
    sql=f"""
    WITH region_sales AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1.0 - l.l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
        JOIN region r    ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
        WHERE r.r_name = '{_Q8_REGION}'
    )
    SELECT o_year,
           round(
             CAST(sum(CASE WHEN supp_nation = '{_Q8_NATION}'
                           THEN CAST(round(volume, 6) AS DECIMAL(28,8)) END)
                  AS DOUBLE)
             / CAST(sum(CAST(round(volume, 6) AS DECIMAL(28,8))) AS DOUBLE),
             4) AS mkt_share
    FROM region_sales GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's suppliers' share of a region's "
    "customer revenue per year — the deepest star join in the repo "
    "(fact -> orders -> customer -> nation -> region on the demand "
    "side, fact -> supplier -> nation on the supply side). All five "
    "dimension sides are broadcast; the only shuffles are "
    "lineitem<->orders co-partitioning and the final year rollup. The "
    "share is a conditional-sum / sum ratio in exact decimal "
    "(functions/agg.py row-quantize policy) so the division is "
    "engine-deterministic.",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")

    demand_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == _Q8_REGION)),
            nation.n_regionkey == region.r_regionkey,
        ).select(F.col("n_nationkey").alias("cnk"))
    )
    sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(demand_nations), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("snk"),
        )
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    vol_dec = F.round(F.col("volume"), 6).cast("decimal(28,8)")
    return sales.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == _Q8_NATION, vol_dec)).cast("double")
            / F.sum(vol_dec).cast("double"),
            4,
        ).alias("mkt_share")
    )
