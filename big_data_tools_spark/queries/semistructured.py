"""Semi-structured queries: JSON/map parsing, explode, dict-literal
cleanup, hours-range parsing (SURVEY.md §2.7 X5-X9, §2.2 P7, build-plan v3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.agg import money_sum
from ..io.sources import load_table
from ..operators.hours import parse_hours_range
from ..operators.maps import parse_dict_literal
from .registry import register


# --------------------------------------------------------------- JSON props map
@register(
    "events_props_extract",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           round(avg(CAST(props->>'$.k' AS BIGINT)), 2) + 0.0 AS k_avg
    FROM events GROUP BY event_type
    """,
    doc="JSON-string column -> typed values via one from_json to "
    "map<string,string> (the scale-correct form of the reference's "
    "stringly-map handling, §1.4) then grouped agg.",
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "map<string,string>").getItem("k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.round(F.avg("k"), 2).alias("k_avg"),
        )
    )


# ------------------------------------------------------------------ hourly agg
@register(
    "events_hourly",
    sql="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS value_sum
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling-window counts in batch form (§2.10 stretch twin): "
    "date_trunc hour + event_type rollup; identical logic drives the "
    "streaming veneer in streaming/.",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("value")).alias("value_sum"),
        )
    )


# -------------------------------------------------------------- explode tokens
@register(
    "part_name_tokens",
    sql="""
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
    doc="split + explode to rows (X6/X9; reference :310,322) then "
    "word-frequency agg.",
)
def part_name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------------------------ hours parse
@register(
    "hours_parse",
    sql="""
    WITH hrs AS (
        SELECT o_orderkey,
               CAST(o_orderkey % 24 AS INT) AS open_h,
               CAST((o_orderkey * 7) % 24 AS INT) AS close_h
        FROM orders
    ), strs AS (
        SELECT o_orderkey, open_h || ':0-' || close_h || ':30' AS hours_str FROM hrs
    ), parsed AS (
        SELECT CAST(split_part(split_part(hours_str, '-', 1), ':', 1) AS INT) AS open_hour,
               CAST(split_part(split_part(hours_str, '-', 2), ':', 1) AS INT) AS close_raw
        FROM strs
    )
    SELECT open_hour,
           CASE WHEN close_raw <= open_hour THEN close_raw + 24 ELSE close_raw END
               - open_hour AS avail_hours,
           CAST(count(*) AS BIGINT) AS n
    FROM parsed GROUP BY 1, 2
    """,
    doc="Opening-hours 'H:mm-H:mm' parser with the +24 past-midnight "
    "wraparound rule (P7/X6-X7; reference :479-512). Hour strings are "
    "synthesized deterministically from orderkeys so the parser runs "
    "against driver data.",
)
def hours_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    hrs = o.select(
        "o_orderkey",
        F.concat(
            (F.col("o_orderkey") % 24).cast("int").cast("string"),
            F.lit(":0-"),
            ((F.col("o_orderkey") * 7) % 24).cast("int").cast("string"),
            F.lit(":30"),
        ).alias("hours_str"),
    )
    parsed = parse_hours_range(hrs, {"biz": "hours_str"})
    return (
        parsed.select(
            F.col("biz_open").alias("open_hour"),
            F.col("biz_avail").alias("avail_hours"),
        )
        .groupBy("open_hour", "avail_hours")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------------- dict-literal -> dummies
@register(
    "map_literal_parse",
    sql="""
    WITH lit AS (
        SELECT c_custkey,
               '{''' || lower(c_mktsegment) || ''': True, ''closed'': False}' AS attrs
        FROM customer
    ), cleaned AS (
        SELECT c_custkey, translate(attrs, '{}''', '') AS s FROM lit
    ), entries AS (
        SELECT c_custkey, unnest(string_split(s, ',')) AS entry FROM cleaned
    ), kv AS (
        SELECT c_custkey,
               split_part(entry, ':', 1) AS key,
               split_part(entry, ':', 2) AS value
        FROM entries
    )
    SELECT key, CAST(count(*) AS BIGINT) AS n_true
    FROM kv WHERE value = ' True' GROUP BY key
    """,
    doc="Python-dict-literal string -> map -> exploded entries -> filter "
    "on the reference's leading-space ' True' artifact (X5/X8/X9/F2; "
    "reference :284-336). Literal strings synthesized from customer "
    "segments so the op runs on driver data.",
)
def map_literal_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    lit = c.select(
        "c_custkey",
        F.concat(
            F.lit("{'"),
            F.lower(F.col("c_mktsegment")),
            F.lit("': True, 'closed': False}"),
        ).alias("attrs"),
    )
    m = parse_dict_literal(F.col("attrs"))
    entries = lit.select("c_custkey", F.explode(m).alias("key", "value"))
    return (
        entries.filter(F.col("value") == " True")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )


@register(
    "events_props_variant",
    sql="""
    SELECT event_type,
           CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_min,
           CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max,
           CAST(count(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS BIGINT)
               AS k_distinct
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured path via Spark 4's VARIANT type: parse_json "
    "once into a binary variant, then typed variant_get extraction — "
    "the open-format successor to from_json-with-declared-schema for "
    "schema-drifting JSON (no schema declared, extraction stays "
    "predicate-pushable and codegen'd). Same grouped rollup shape as "
    "events_props_extract so the two semi-structured paths are "
    "directly comparable.",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.countDistinct("k").alias("k_distinct"),
        )
    )


@register(
    "synthetic_source_rollup",
    sql=None,  # input comes from the Python DataSource, not a parquet table
    doc="Custom Python DataSource (Spark 4 DataSource API, io/"
    "pysource.py): a deterministic partitioned generator registered "
    "per-session and read like any format — partition planning on the "
    "driver, per-slice generation on executors. Rolled up per event "
    "type. Rows-only driver check; exact deterministic content "
    "asserted in tests/test_pysource.py.",
)
def synthetic_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.pysource import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 20_000)
        .option("partitions", 16)
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
            "value_sum"
        ),
    )
