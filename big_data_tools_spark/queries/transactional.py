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


@register(
    "delta_read_snapshot",
    sql=f"""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({_CENTS}) AS BIGINT) AS sum_cents
    FROM orders WHERE o_orderkey % 9 <> 0
    GROUP BY o_orderstatus
    """,
    doc="Dependency-free Delta Lake READ path (io/deltaread.py, r10): "
    "builds a scratch Delta table from orders BY HAND against the "
    "open transaction-log protocol — commit 0 adds two data files "
    "(the orderkey %3==0 slice and the rest) with metaData+protocol, "
    "commit 1 is a delete-rewrite (REMOVE the first file, ADD its "
    "rows minus %9==0 keys) — then reads the latest snapshot via the "
    "log replay and rolls it up by status. The twin is the final "
    "relational state (orders minus %9 keys, since %9==0 implies "
    "%3==0), so the driver hash checks add/remove replay end-to-end: "
    "a reader that ignored the remove would double-count the %3 "
    "slice and fail. Money integer cents. Scale shape: replay "
    "touches only _delta_log (KBs); the data read is a plain parquet "
    "scan over the active-file list with pushdown/pruning intact — "
    "this is the interop path that lets OTHER systems' Delta tables "
    "be read in place without the Delta runtime (reference has no "
    "lakehouse interop; north-star surface).",
)
def delta_read_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json
    import os
    import shutil

    from ..io.deltaread import read_delta

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_orderstatus").alias("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="bdt_delta_q_") + "/tbl"
    os.makedirs(root)

    def write_file(df: DataFrame, rel: str) -> None:
        stage = tempfile.mkdtemp(prefix="bdt_delta_stage_")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        os.replace(part, os.path.join(root, rel))
        shutil.rmtree(stage, ignore_errors=True)

    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "o_orderkey", "type": "long",
                 "nullable": True, "metadata": {}},
                {"name": "o_orderstatus", "type": "string",
                 "nullable": True, "metadata": {}},
                {"name": "cents", "type": "long",
                 "nullable": True, "metadata": {}},
            ],
        }
    )
    write_file(o.filter(F.col("o_orderkey") % 3 == 0), "f-a.parquet")
    write_file(o.filter(F.col("o_orderkey") % 3 != 0), "f-b.parquet")
    write_file(
        o.filter((F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 9 != 0)),
        "f-a-rewrite.parquet",
    )
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)

    def commit(version: int, actions: list[dict]) -> None:
        with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    commit(0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "bdt-delta-q", "schemaString": schema_json,
                      "partitionColumns": [],
                      "format": {"provider": "parquet", "options": {}}}},
        {"add": {"path": "f-a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "f-b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    commit(1, [
        {"remove": {"path": "f-a.parquet", "dataChange": True}},
        {"add": {"path": "f-a-rewrite.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    snap = read_delta(spark, root)
    return snap.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("sum_cents"),
    )


@register(
    "iceberg_read_snapshot",
    sql=f"""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({_CENTS}) AS BIGINT) AS sum_cents
    FROM orders WHERE o_orderkey % 9 <> 0
    GROUP BY o_orderstatus
    """,
    doc="Dependency-free Apache Iceberg READ path (io/icebergread.py, "
    "r10): builds a spec-shaped two-snapshot Iceberg table from "
    "orders — REAL avro manifests written through the JVM avro "
    "library already on Spark's classpath, JSON table metadata, "
    "snapshot 1 adds two data files (orderkey %3==0 slice + rest), "
    "snapshot 2 is a delete-rewrite (status=DELETED on the first "
    "file, ADDED rewrite minus %9==0 keys) — then resolves the "
    "current snapshot through metadata -> manifest list -> manifests "
    "and rolls up the snapshot read by status. Same relational final "
    "state as delta_read_snapshot (orders minus %9 keys), so the "
    "driver hash checks manifest-status replay end-to-end: a reader "
    "that ignored DELETED entries would double-count the %3 slice. "
    "Money integer cents. Scale shape: manifest parsing is "
    "driver-side metadata (KBs); the data read is one distributed "
    "parquet scan. Reference has no lakehouse interop (north-star "
    "surface).",
)
def iceberg_read_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json
    import os
    import shutil

    from ..io.icebergread import read_iceberg

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_orderstatus").alias("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="bdt_iceberg_q_") + "/tbl"
    os.makedirs(os.path.join(root, "metadata"))

    def write_file(df: DataFrame, rel: str) -> str:
        stage = tempfile.mkdtemp(prefix="bdt_ice_stage_")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(root, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.replace(part, dest)
        shutil.rmtree(stage, ignore_errors=True)
        return dest

    jvm = spark._jvm
    entry_schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps({
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                ],
            }},
        ],
    }))
    list_schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps({
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "content", "type": "int"},
        ],
    }))

    def write_manifest(rel: str, entries: list[tuple[str, int]]) -> str:
        dest = os.path.join(root, "metadata", rel)
        w = jvm.org.apache.avro.generic.GenericDatumWriter(entry_schema)
        dfw = jvm.org.apache.avro.file.DataFileWriter(w)
        dfw.create(entry_schema, jvm.java.io.File(dest))
        dsch = entry_schema.getField("data_file").schema()
        for fpath, status in entries:
            rec = jvm.org.apache.avro.generic.GenericData.Record(entry_schema)
            rec.put("status", status)
            sub = jvm.org.apache.avro.generic.GenericData.Record(dsch)
            sub.put("content", 0)
            sub.put("file_path", fpath)
            sub.put("file_format", "PARQUET")
            sub.put("record_count", 1)
            rec.put("data_file", sub)
            dfw.append(rec)
        dfw.close()
        return dest

    def write_manifest_list(rel: str, manifests: list[str]) -> str:
        dest = os.path.join(root, "metadata", rel)
        w = jvm.org.apache.avro.generic.GenericDatumWriter(list_schema)
        dfw = jvm.org.apache.avro.file.DataFileWriter(w)
        dfw.create(list_schema, jvm.java.io.File(dest))
        for m in manifests:
            rec = jvm.org.apache.avro.generic.GenericData.Record(list_schema)
            rec.put("manifest_path", m)
            rec.put("manifest_length", 1)
            rec.put("content", 0)
            dfw.append(rec)
        dfw.close()
        return dest

    fa = write_file(o.filter(F.col("o_orderkey") % 3 == 0), "data/a.parquet")
    fb = write_file(o.filter(F.col("o_orderkey") % 3 != 0), "data/b.parquet")
    fa2 = write_file(
        o.filter((F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 9 != 0)),
        "data/a-rewrite.parquet",
    )
    m1 = write_manifest("m1.avro", [(fa, 1), (fb, 1)])
    ml1 = write_manifest_list("sl1.avro", [m1])
    m2 = write_manifest("m2.avro", [(fa, 2), (fa2, 1), (fb, 0)])
    ml2 = write_manifest_list("sl2.avro", [m2])
    meta = {
        "format-version": 2,
        "table-uuid": "bdt-iceberg-q",
        "location": root,
        "current-snapshot-id": 2,
        "snapshots": [
            {"snapshot-id": 1, "manifest-list": ml1},
            {"snapshot-id": 2, "manifest-list": ml2},
        ],
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "o_orderkey", "required": False, "type": "long"},
            {"id": 2, "name": "o_orderstatus", "required": False,
             "type": "string"},
            {"id": 3, "name": "cents", "required": False, "type": "long"},
        ]}],
        "current-schema-id": 0,
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    snap = read_iceberg(spark, root)
    return snap.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("sum_cents"),
    )
