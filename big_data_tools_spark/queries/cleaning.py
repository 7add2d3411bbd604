"""Cleaning / repair queries (SURVEY.md §2.7 X1,X4,X14; §2.2 P3; build-plan v2).

Covers the reference's dirty-data repair surface on driver data:
- single-digit string timestamps parsed with explicit patterns
  (``Databricks Notebook.py:129`` 'yyyy-M-d H:mm:ss') including the
  checkin table's leading-space quirk repaired with ltrim (``:172``);
- null repair after left joins: constant fill and fill-with-computed-
  max (``:521-522,648-653,669,677``);
- bulk rename (``:199``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.agg import money_sum
from ..io.sources import load_table
from ..operators.scalar import with_global_agg
from .registry import register


@register(
    "string_date_parse",
    sql="""
    WITH strs AS (
        -- single-digit month/day strings with a leading space, the
        -- reference checkin format (':172')
        SELECT o_orderkey,
               ' ' || strftime(o_orderdate, '%Y-%-m-%-d %H:%M:%S') AS date_str
        FROM orders
    ), parsed AS (
        SELECT strptime(ltrim(date_str), '%Y-%-m-%-d %H:%M:%S') AS d FROM strs
    )
    SELECT CAST(year(d) AS INT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_checkins,
           CAST(min(date_diff('day', d, TIMESTAMP '2002-01-01')) AS INT) AS min_recency,
           CAST(max(date_diff('day', d, TIMESTAMP '2002-01-01')) AS INT) AS max_recency
    FROM parsed GROUP BY 1
    """,
    doc="checkin-metrics shape (A2): ltrim a leading-space date string "
    "(X4; reference :172), parse with the explicit single-digit pattern "
    "'yyyy-M-d H:mm:ss' (X1; reference :129,175), datediff recency vs a "
    "pivot date (X2), grouped count/min/max. Strings are synthesized "
    "from o_orderdate so the parser runs on driver data.",
)
def string_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    strs = o.select(
        F.concat(F.lit(" "), F.date_format("o_orderdate", "yyyy-M-d H:mm:ss")).alias("date_str")
    )
    parsed = strs.select(
        F.to_timestamp(F.ltrim(F.col("date_str")), "yyyy-M-d H:mm:ss").alias("d")
    )
    return (
        parsed.groupBy(F.year("d").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_checkins"),
            F.min(F.datediff(F.lit("2002-01-01").cast("date"), F.col("d"))).alias("min_recency"),
            F.max(F.datediff(F.lit("2002-01-01").cast("date"), F.col("d"))).alias("max_recency"),
        )
    )


@register(
    "fillna_policy",
    sql="""
    WITH per_supp AS (
        SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS supp_rev
        FROM lineitem GROUP BY l_suppkey
    ), mx AS (SELECT max(supp_rev) AS max_rev FROM per_supp)
    SELECT s.s_suppkey,
           coalesce(p.n_lines, 0) AS n_lines,
           coalesce(p.supp_rev, 0.0) AS supp_rev,
           coalesce(p.supp_rev, m.max_rev) AS supp_rev_maxfill
    FROM supplier s
    LEFT JOIN per_supp p ON s.s_suppkey = p.l_suppkey
    CROSS JOIN mx m
    """,
    doc="Null-repair policies after a left join (X14): constant 0-fill "
    "(reference :677) and fill-with-computed-max kept distributed via "
    "broadcast scalar (reference :668-669 collects; §4.3 fix).",
)
def fillna_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        money_sum(F.col("l_extendedprice")).alias("supp_rev"),
    )
    joined = s.select("s_suppkey").join(
        per_supp, s.s_suppkey == per_supp.l_suppkey, "left"
    ).drop("l_suppkey")
    with_max = with_global_agg(joined, max_rev=F.max("supp_rev"))
    return with_max.select(
        "s_suppkey",
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("supp_rev"), F.lit(0.0)).alias("supp_rev"),
        F.coalesce(F.col("supp_rev"), F.col("max_rev")).alias("supp_rev_maxfill"),
    )


@register(
    "bulk_rename",
    sql="""
    SELECT r_regionkey AS region_key, r_name AS region_name,
           CAST(count(*) AS BIGINT) AS n_nations
    FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2
    """,
    doc="Bulk column rename via toDF (P3; reference :199 dotted-name "
    "flatten) composed with a join+agg.",
)
def bulk_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    renamed = r.toDF(*[c.replace("r_", "region_").replace("_name", "_name") for c in r.columns])
    # region_regionkey, region_name after the bulk rename
    renamed = renamed.withColumnRenamed("region_regionkey", "region_key")
    return (
        renamed.join(F.broadcast(n), renamed.region_key == n.n_regionkey, "inner")
        .groupBy("region_key", "region_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       CAST(count(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders"""
    for c in _PROFILE_COLS
)


@register(
    "orders_profile",
    sql=_PROFILE_SQL,
    doc="Single-pass schema-wide profile (operators/profile.py): "
    "every column's null count + distinct count from ONE aggregation, "
    "long-form output. Modernizes the reference's per-table inspection "
    "loop (shape probes :39-723, distinct audits :228-266, uniqueness "
    "probe :296 — one full job each there). Exact distinct here for "
    "the oracle; approx=True (HLL++, no Expand) is the 100 TB form.",
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_table

    return profile_table(
        load_table(spark, sf_dir, "orders"), columns=list(_PROFILE_COLS)
    )
