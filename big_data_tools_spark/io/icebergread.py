"""Dependency-free Apache Iceberg READ path (open spec, no new jars).

An Iceberg table is parquet data files plus a ``metadata/`` directory:
JSON table metadata (``v{N}.metadata.json`` — schemas, snapshots, the
current snapshot id), an avro MANIFEST LIST per snapshot (which
manifests make up the snapshot), and avro MANIFESTS (which data files
each tracks, with add/existing/delete status). The spec is public
(https://iceberg.apache.org/spec/); none of the metadata requires the
Iceberg runtime to read. JSON is stdlib; the avro manifests are parsed
DRIVER-SIDE through ``org.apache.avro`` — already on every Spark
classpath (avro-1.12 ships in pyspark's jars) — via py4j. Manifests
are metadata (KBs-MBs), so driver-side parsing is the same
architectural tier as Delta's log replay in :mod:`deltaread`; the data
read stays one distributed parquet scan with pushdown/pruning/AQE
intact. Iceberg data files physically CONTAIN their identity-partition
source columns (unlike hive layouts), so no partition-value injection
is needed.

Scope, gated honestly (never silently wrong):
  - format-version 1 and 2, parquet (and ORC) data files;
  - time travel by ``snapshot_id``;
  - v2 DELETE FILES (position/equality deletes) raise
    ``UnsupportedIcebergFeature`` — applying them needs an anti-join
    merge this reader does not implement;
  - schema resolution is name-based: a table whose columns were
    RENAMED through field-id mapping would resolve wrongly, so the
    reader cross-checks the parquet footer's column names against the
    expected schema and raises on mismatch instead of mis-binding.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "read_iceberg",
    "iceberg_snapshot_files",
    "UnsupportedIcebergFeature",
]


class UnsupportedIcebergFeature(Exception):
    """Table requires features beyond this reader's scope."""


_DELETED = 2          # manifest-entry status
_CONTENT_DATA = 0     # data_file.content / manifest_file.content


def _localize(p: str) -> str:
    return re.sub(r"^file:/{0,2}", "/", p) if p.startswith("file:") else p


def _latest_metadata(path: str) -> str:
    mdir = os.path.join(path, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        v = open(hint).read().strip()
        cand = os.path.join(mdir, f"v{v}.metadata.json")
        if os.path.exists(cand):
            return cand
    metas = sorted(
        f for f in os.listdir(mdir) if f.endswith(".metadata.json")
    )
    if not metas:
        raise FileNotFoundError(f"no *.metadata.json under {mdir}")
    return os.path.join(mdir, metas[-1])


def _avro_records(spark: SparkSession, path: str):
    """Yield GenericRecords of one avro file via the JVM avro library."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(_localize(path)), reader
    )
    try:
        while dfr.hasNext():
            yield dfr.next()
    finally:
        dfr.close()


def _jstr(v):
    return None if v is None else v.toString() if hasattr(v, "toString") else str(v)


_PRIMS = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "time": T.LongType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "string": T.StringType(),
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
}


def _iceberg_type(t) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIMS:
            return _PRIMS[t]
        m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        if re.fullmatch(r"fixed\[\d+\]", t):
            return T.BinaryType()
        raise UnsupportedIcebergFeature(f"unknown primitive type: {t}")
    kind = t.get("type")
    if kind == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"], _iceberg_type(f["type"]), not f.get("required", False)
                )
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return T.ArrayType(
            _iceberg_type(t["element"]), not t.get("element-required", False)
        )
    if kind == "map":
        return T.MapType(
            _iceberg_type(t["key"]),
            _iceberg_type(t["value"]),
            not t.get("value-required", False),
        )
    raise UnsupportedIcebergFeature(f"unknown type node: {t}")


def _schema(meta: dict) -> T.StructType:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        node = next(s for s in meta["schemas"] if s.get("schema-id", 0) == sid)
    else:
        node = meta["schema"]  # format v1
    return _iceberg_type({"type": "struct", "fields": node["fields"]})


def _snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots") or []
    if not snaps:
        raise ValueError("table has no snapshots")
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            raise ValueError("no current snapshot")
    for s in snaps:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise ValueError(f"snapshot {snapshot_id} not found")


def _data_files(spark: SparkSession, path: str, snap: dict) -> list[str]:
    manifests: list[str] = []
    if "manifest-list" in snap:
        for rec in _avro_records(spark, snap["manifest-list"]):
            content = rec.get("content")
            if content is not None and int(str(content)) != _CONTENT_DATA:
                raise UnsupportedIcebergFeature(
                    "snapshot carries a DELETE manifest (v2 row-level "
                    "deletes); this reader does not apply delete files"
                )
            manifests.append(_jstr(rec.get("manifest_path")))
    else:  # v1 inline manifest paths
        manifests = list(snap.get("manifests") or [])

    files: list[str] = []
    for m in manifests:
        for rec in _avro_records(spark, m):
            status = rec.get("status")
            if status is not None and int(str(status)) == _DELETED:
                continue
            df_rec = rec.get("data_file")
            if df_rec is None:
                continue
            content = df_rec.get("content")
            if content is not None and int(str(content)) != _CONTENT_DATA:
                raise UnsupportedIcebergFeature(
                    "manifest tracks a delete file (data_file.content != 0)"
                )
            fmt = (_jstr(df_rec.get("file_format")) or "PARQUET").upper()
            if fmt not in ("PARQUET", "ORC"):
                raise UnsupportedIcebergFeature(f"data file format {fmt}")
            files.append((_localize(_jstr(df_rec.get("file_path"))), fmt))
    if files and len({fmt for _, fmt in files}) > 1:
        raise UnsupportedIcebergFeature("mixed data-file formats")
    return [p for p, _ in files]


def iceberg_snapshot_files(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> list[str]:
    """Live data-file paths of a snapshot (inspection / audit surface)."""
    meta = json.load(open(_latest_metadata(path)))
    return sorted(_data_files(spark, path, _snapshot(meta, snapshot_id)))


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read an Iceberg table snapshot (latest, or time-travel to
    ``snapshot_id``) as a plain DataFrame."""
    meta = json.load(open(_latest_metadata(path)))
    if meta.get("format-version", 1) > 2:
        raise UnsupportedIcebergFeature(
            f"format-version {meta['format-version']} > 2"
        )
    schema = _schema(meta)
    files = _data_files(spark, path, _snapshot(meta, snapshot_id))
    if not files:
        return spark.createDataFrame([], schema)
    # name-based binding guard: renamed-via-field-id columns would
    # silently mis-resolve, so compare footer names to the schema
    footer = spark.read.parquet(files[0]).schema
    expected = {f.name for f in schema.fields}
    got = set(footer.names)
    if not got <= expected:
        raise UnsupportedIcebergFeature(
            f"parquet columns {sorted(got - expected)} not in table "
            "schema — field-id renames need an id-mapping reader"
        )
    return spark.read.schema(schema).parquet(*files)
