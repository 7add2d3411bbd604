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
  - v2 POSITION deletes are applied (r11): one anti-join of the
    ``_metadata``-tagged data scan against the delete files'
    ``(file_path, pos)`` rows. EQUALITY deletes still raise
    ``UnsupportedIcebergFeature`` — they need the table's
    equality-field semantics;
  - schema resolution is name-based: a table whose columns were
    RENAMED through field-id mapping would resolve wrongly, so the
    reader cross-checks EVERY data file's footer column names (one
    distributed mergeSchema footer pass) against the expected schema
    and raises on mismatch instead of mis-binding.
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
    metas = [f for f in os.listdir(mdir) if f.endswith(".metadata.json")]
    if not metas:
        raise FileNotFoundError(f"no *.metadata.json under {mdir}")

    # order by NUMERIC version, not lexicographically: with v{N} naming
    # a lexical sort picks v9 over v10 and silently reads a stale
    # snapshot (r10 ADVICE). Files without a parseable version (UUID
    # naming) sort before any versioned file of the same mtime tier.
    def _version(name: str) -> int:
        m = re.search(r"v?(\d+)", name[: -len(".metadata.json")])
        return int(m.group(1)) if m else -1

    metas.sort(key=lambda f: (_version(f), f))
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


_CONTENT_POS_DELETE = 1   # data_file.content / manifest_file.content
_CONTENT_EQ_DELETE = 2


def _data_files(
    spark: SparkSession, path: str, snap: dict
) -> tuple[list[str], str, list[str]]:
    """(data file paths, single data-file format, POSITION-delete file
    paths) of a snapshot. Equality deletes raise — applying them needs
    the table's equality-field semantics this reader does not carry;
    position deletes are applied by :func:`read_iceberg` as one
    anti-join on (file_path, row position)."""
    data_manifests: list[str] = []
    delete_manifests: list[str] = []
    if "manifest-list" in snap:
        for rec in _avro_records(spark, snap["manifest-list"]):
            content = rec.get("content")
            mpath = _jstr(rec.get("manifest_path"))
            if content is not None and int(str(content)) != _CONTENT_DATA:
                delete_manifests.append(mpath)
            else:
                data_manifests.append(mpath)
    else:  # v1 inline manifest paths
        data_manifests = list(snap.get("manifests") or [])

    files: list[tuple[str, str]] = []
    for m in data_manifests:
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
                    "DATA manifest tracks a delete file "
                    "(data_file.content != 0)"
                )
            fmt = (_jstr(df_rec.get("file_format")) or "PARQUET").upper()
            if fmt not in ("PARQUET", "ORC"):
                raise UnsupportedIcebergFeature(f"data file format {fmt}")
            files.append((_localize(_jstr(df_rec.get("file_path"))), fmt))
    if files and len({fmt for _, fmt in files}) > 1:
        raise UnsupportedIcebergFeature("mixed data-file formats")
    fmt = files[0][1] if files else "PARQUET"

    pos_deletes: list[str] = []
    for m in delete_manifests:
        for rec in _avro_records(spark, m):
            status = rec.get("status")
            if status is not None and int(str(status)) == _DELETED:
                continue
            df_rec = rec.get("data_file")
            if df_rec is None:
                continue
            content = int(str(df_rec.get("content") or 0))
            if content == _CONTENT_EQ_DELETE:
                raise UnsupportedIcebergFeature(
                    "snapshot carries EQUALITY delete files; this "
                    "reader applies position deletes only"
                )
            if content != _CONTENT_POS_DELETE:
                raise UnsupportedIcebergFeature(
                    f"delete manifest entry with content={content}"
                )
            dfmt = (_jstr(df_rec.get("file_format")) or "PARQUET").upper()
            if dfmt != "PARQUET":
                raise UnsupportedIcebergFeature(
                    f"position-delete file format {dfmt}"
                )
            pos_deletes.append(_localize(_jstr(df_rec.get("file_path"))))
    return [p for p, _ in files], fmt, pos_deletes


def iceberg_snapshot_files(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> list[str]:
    """Live data-file paths of a snapshot (inspection / audit surface)."""
    meta = json.load(open(_latest_metadata(path)))
    paths, _fmt, _del = _data_files(spark, path, _snapshot(meta, snapshot_id))
    return sorted(paths)


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
    files, fmt, pos_deletes = _data_files(
        spark, path, _snapshot(meta, snapshot_id)
    )
    if not files:
        return spark.createDataFrame([], schema)
    # name-based binding guard: renamed-via-field-id columns would
    # silently mis-resolve (NULLs, not errors), so compare footer
    # names to the schema — for EVERY file, not just files[0]: a
    # rename mid-history leaves old data files carrying the old name
    # (r10 ADVICE). mergeSchema unions all footers in one distributed
    # footer-only pass, so the guard stays metadata-scale.
    merged = spark.read.option("mergeSchema", "true")
    footer = (
        merged.orc(*files) if fmt == "ORC" else merged.parquet(*files)
    ).schema
    expected = {f.name for f in schema.fields}
    got = set(footer.names)
    if not got <= expected:
        raise UnsupportedIcebergFeature(
            f"data-file columns {sorted(got - expected)} not in table "
            "schema — field-id renames need an id-mapping reader"
        )
    reader = spark.read.schema(schema)
    out = reader.orc(*files) if fmt == "ORC" else reader.parquet(*files)
    if not pos_deletes:
        return out
    return _apply_position_deletes(spark, out, schema, pos_deletes)


def _norm_path(col):
    # delete-file file_path values and _metadata.file_path both come in
    # URI or plain-path spellings; normalize "file:"-scheme to a plain
    # absolute path so the anti-join keys agree
    from pyspark.sql import functions as F

    return F.regexp_replace(col.cast("string"), "^file:/+", "/")


def _apply_position_deletes(
    spark: SparkSession, data: DataFrame, schema: T.StructType,
    deletes: list[str],
) -> DataFrame:
    """Iceberg v2 position deletes (spec: parquet files of
    ``(file_path, pos)``) applied as ONE anti-join of the data scan —
    tagged with its hidden ``_metadata.file_path`` / ``row_index``
    columns, which Spark derives for free during the parquet read —
    against the union of delete files. Delete files are metadata-scale
    next to the data (a tombstone row per deleted record), so the
    delete side is broadcast; at a truly huge delete count Spark's
    size check degrades it to a shuffle join on its own. Sequence
    numbers are not consulted: a position delete targets a data file
    by PATH, and Iceberg never re-adds a new file under an old path,
    so path-targeted tombstones cannot apply to the wrong file."""
    from pyspark.sql import functions as F

    del_df = (
        spark.read.parquet(*deletes)
        .select(
            _norm_path(F.col("file_path")).alias("__del_fp"),
            F.col("pos").cast("long").alias("__del_pos"),
        )
        .distinct()
    )
    tagged = data.select(
        *[F.col(f.name) for f in schema.fields],
        _norm_path(F.col("_metadata.file_path")).alias("__fp"),
        F.col("_metadata.row_index").alias("__pos"),
    )
    kept = tagged.join(
        F.broadcast(del_df),
        (F.col("__fp") == F.col("__del_fp"))
        & (F.col("__pos") == F.col("__del_pos")),
        "left_anti",
    )
    return kept.select(*[F.col(f.name) for f in schema.fields])
