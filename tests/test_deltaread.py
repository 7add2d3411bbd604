"""Dependency-free Delta Lake read path (io/deltaread.py): the open
transaction-log protocol replayed by hand against hand-built tables —
add/remove replay, time travel, hive partitions, parquet checkpoints,
and the honest v2-feature gate."""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_tools_spark.io.deltaread import (
    UnsupportedDeltaFeature,
    delta_snapshot_files,
    read_delta,
)

_SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_file(spark, rows, path):
    """One exact-named parquet data file."""
    stage = tempfile.mkdtemp(prefix="bdt_delta_stage_")
    spark.createDataFrame(rows, "id long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    os.replace(part, path)
    shutil.rmtree(stage, ignore_errors=True)


def _commit(root, version, actions):
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(part_cols=()):
    return {
        "metaData": {
            "id": "fixture",
            "schemaString": _SCHEMA_JSON,
            "partitionColumns": list(part_cols),
            "format": {"provider": "parquet", "options": {}},
        }
    }


def _basic_table(spark, root):
    """v0: two files; v1: compaction-rewrite of file a (drops id=1)."""
    _write_file(spark, [(1, "a"), (2, "b")], os.path.join(root, "f0.parquet"))
    _write_file(spark, [(3, "c")], os.path.join(root, "f1.parquet"))
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(),
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    _write_file(spark, [(2, "b")], os.path.join(root, "f0r.parquet"))
    _commit(root, 1, [
        {"remove": {"path": "f0.parquet", "dataChange": True}},
        {"add": {"path": "f0r.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])


def test_add_remove_replay_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _basic_table(spark, root)
    latest = {(r["id"], r["v"]) for r in read_delta(spark, root).collect()}
    assert latest == {(2, "b"), (3, "c")}  # remove honored, rewrite read
    v0 = {(r["id"], r["v"]) for r in read_delta(spark, root, version=0).collect()}
    assert v0 == {(1, "a"), (2, "b"), (3, "c")}
    files = delta_snapshot_files(spark, root)
    assert [os.path.basename(f) for f in files] == ["f0r.parquet", "f1.parquet"]


def test_hive_partitioned_read(spark, tmp_path):
    root = str(tmp_path / "ptbl")
    _write_file(spark, [(1, "a")], os.path.join(root, "p=x/d0.parquet"))
    _write_file(spark, [(2, "b")], os.path.join(root, "p=y/d1.parquet"))
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            {"name": "p", "type": "string", "nullable": True, "metadata": {}},
        ],
    })
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "fixture", "schemaString": schema,
                      "partitionColumns": ["p"],
                      "format": {"provider": "parquet", "options": {}}}},
        {"add": {"path": "p=x/d0.parquet", "partitionValues": {"p": "x"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "p=y/d1.parquet", "partitionValues": {"p": "y"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    df = read_delta(spark, root)
    assert df.columns == ["id", "v", "p"]
    rows = {(r["id"], r["v"], r["p"]) for r in df.collect()}
    assert rows == {(1, "a", "x"), (2, "b", "y")}
    # partition pruning must reach the scan: filtering p=x reads 1 file
    pruned = df.filter(F.col("p") == "x")
    assert pruned.count() == 1


def test_checkpoint_replay(spark, tmp_path):
    """Snapshot state comes from the parquet checkpoint plus ONLY the
    commits after it — proven by deleting the pre-checkpoint JSON."""
    root = str(tmp_path / "cktbl")
    _write_file(spark, [(1, "a")], os.path.join(root, "f0.parquet"))
    _write_file(spark, [(2, "b")], os.path.join(root, "f1.parquet"))
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add_t = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("partitionValues", T.MapType(T.StringType(), T.StringType())),
    ])
    meta_t = T.StructType([
        T.StructField("schemaString", T.StringType()),
        T.StructField("partitionColumns", T.ArrayType(T.StringType())),
    ])
    proto_t = T.StructType([T.StructField("minReaderVersion", T.IntegerType())])
    ck_schema = T.StructType([
        T.StructField("add", add_t),
        T.StructField("metaData", meta_t),
        T.StructField("protocol", proto_t),
    ])
    rows = [
        (("f0.parquet", {}), None, None),
        (None, (_SCHEMA_JSON, []), None),
        (None, None, (1,)),
    ]
    stage = tempfile.mkdtemp(prefix="bdt_ck_stage_")
    spark.createDataFrame(rows, ck_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.replace(part, os.path.join(log, f"{0:020d}.checkpoint.parquet"))
    shutil.rmtree(stage, ignore_errors=True)
    # commit AFTER the checkpoint adds f1
    _commit(root, 1, [
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    rows = {(r["id"], r["v"]) for r in read_delta(spark, root).collect()}
    assert rows == {(1, "a"), (2, "b")}


def test_v2_reader_features_refused(spark, tmp_path):
    root = str(tmp_path / "v2tbl")
    _write_file(spark, [(1, "a")], os.path.join(root, "f0.parquet"))
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
        _meta(),
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(UnsupportedDeltaFeature):
        read_delta(spark, root)


def test_not_a_delta_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_delta(spark, str(tmp_path / "nope"))


# ------------------------------------------------- column mapping (r11)

_MAPPED_SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bbb"}},
        ],
    }
)


def _mapped_meta(part_cols=()):
    return {
        "metaData": {
            "id": "fixture-mapped",
            "schemaString": _MAPPED_SCHEMA_JSON,
            "partitionColumns": list(part_cols),
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
            "format": {"provider": "parquet", "options": {}},
        }
    }


def _write_mapped_file(spark, rows, path):
    """Data file carrying PHYSICAL column names, as a mapped writer does."""
    stage = tempfile.mkdtemp(prefix="bdt_delta_stage_")
    spark.createDataFrame(rows, "`col-aaa` long, `col-bbb` string").coalesce(
        1
    ).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    os.replace(part, path)
    shutil.rmtree(stage, ignore_errors=True)


def test_column_mapping_name_mode_reads_logical_names(spark, tmp_path):
    root = str(tmp_path / "mapped")
    _write_mapped_file(spark, [(1, "a"), (2, "b")],
                       os.path.join(root, "f0.parquet"))
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _mapped_meta(),
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    df = read_delta(spark, root)
    assert df.columns == ["id", "v"]
    assert {(r["id"], r["v"]) for r in df.collect()} == {(1, "a"), (2, "b")}
    # predicate pushdown survives the alias projection: the pushed
    # filter must reference the PHYSICAL parquet column
    plan = df.filter(F.col("id") == 2)._jdf.queryExecution().executedPlan().toString()
    assert "col-aaa" in plan and "PushedFilters: [" in plan


def test_column_mapping_v3_reader_features_pass(spark, tmp_path):
    root = str(tmp_path / "mapped3")
    _write_mapped_file(spark, [(7, "z")], os.path.join(root, "f0.parquet"))
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        _mapped_meta(),
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    assert {(r["id"], r["v"]) for r in read_delta(spark, root).collect()} == {
        (7, "z")
    }
    # ...but deletion vectors still refuse
    _commit(root, 1, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping", "deletionVectors"]}},
    ])
    with pytest.raises(UnsupportedDeltaFeature, match="deletionVectors"):
        read_delta(spark, root)


def test_column_mapping_hive_partitioned_physical_paths(spark, tmp_path):
    """Partition dirs and partitionValues keys use PHYSICAL names; the
    result still comes back under logical names with pruning intact."""
    root = str(tmp_path / "mappedpart")
    stage = tempfile.mkdtemp(prefix="bdt_delta_stage_")
    spark.createDataFrame([(1,)], "`col-aaa` long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    dest = os.path.join(root, "col-bbb=a", "f0.parquet")
    os.makedirs(os.path.dirname(dest))
    os.replace(part, dest)
    shutil.rmtree(stage, ignore_errors=True)
    stage = tempfile.mkdtemp(prefix="bdt_delta_stage_")
    spark.createDataFrame([(2,)], "`col-aaa` long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    dest = os.path.join(root, "col-bbb=b", "f1.parquet")
    os.makedirs(os.path.dirname(dest))
    os.replace(part, dest)
    shutil.rmtree(stage, ignore_errors=True)
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _mapped_meta(part_cols=["v"]),
        {"add": {"path": "col-bbb=a/f0.parquet",
                 "partitionValues": {"col-bbb": "a"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "col-bbb=b/f1.parquet",
                 "partitionValues": {"col-bbb": "b"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    df = read_delta(spark, root)
    assert sorted(df.columns) == ["id", "v"]
    assert {(r["id"], r["v"]) for r in df.collect()} == {(1, "a"), (2, "b")}
    plan = (
        df.filter(F.col("v") == "a")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan  # pruning reaches the scan


def test_column_mapping_id_mode_refused(spark, tmp_path):
    root = str(tmp_path / "idmode")
    _write_mapped_file(spark, [(1, "a")], os.path.join(root, "f0.parquet"))
    meta = _mapped_meta()
    meta["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta,
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(UnsupportedDeltaFeature, match="id"):
        read_delta(spark, root)
