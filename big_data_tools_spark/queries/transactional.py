"""Transactional merge-table queries (io/mergetable.py, round 7).

The registered query drives the REAL table lifecycle — create, a
merge-upsert batch with updates/inserts/deletes, snapshot read — on a
scratch table, and returns a rollup of the final snapshot. Because
every merge input is a deterministic function of the orders table, the
final state is SQL-expressible and the whole transactional path gets a
hash-level DuckDB twin (stronger than the rows-only checks the
streaming ledger sinks get).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from .registry import register

_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "orders_merge_upsert_rollup",
    sql=f"""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               {_CENTS} AS cents
        FROM orders WHERE o_orderkey % 3 <> 0
    ), upd AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               {_CENTS} + 100 AS cents,
               o_orderkey % 9 = 0 AS deleted
        FROM orders WHERE o_orderkey % 2 = 0
    ), final AS (
        SELECT k, status, cents FROM base
        WHERE k NOT IN (SELECT k FROM upd)
        UNION ALL
        SELECT k, status, cents FROM upd WHERE NOT deleted
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM final GROUP BY status
    """,
    doc="End-to-end transactional merge-table exercise "
    "(io/mergetable.py): create a bucketed copy-on-write table from "
    "the orderkey %3<>0 slice of orders, MERGE one batch holding "
    "updates (+100 cents corrections on even keys), inserts (even "
    "keys absent from the base), and tombstone deletes (%9 keys), "
    "then roll up the final SNAPSHOT read by status. The twin "
    "reconstructs merge semantics relationally (base anti-join "
    "update-keys union surviving updates), so the driver hash checks "
    "the whole create->merge->atomic-commit->snapshot-read path, not "
    "just the arithmetic. Money is integer cents end-to-end (r7 float "
    "policy). Scale shape: the merge rewrites only buckets containing "
    "updated keys (O(touched buckets), untouched files carried by "
    "manifest reference); the rollup is one map-side-combining "
    "aggregate over the snapshot.",
)
def orders_merge_upsert_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.mergetable import DELETED_COL, create_table, merge_upsert, read_table

    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    base = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        cents.alias("cents"),
    )
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        (cents + 100).alias("cents"),
        (F.col("o_orderkey") % 9 == 0).alias(DELETED_COL),
    )
    # scratch table per invocation; left for /tmp cleanup so the
    # returned frame stays readable until the caller collects it
    root = tempfile.mkdtemp(prefix="bdt_mergetable_q_") + "/tbl"
    create_table(spark, root, base, keys=["k"], n_buckets=8)
    merge_upsert(spark, root, updates, batch_id="q-batch-1")
    snap = read_table(spark, root)
    return snap.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("sum_cents"),
    )
