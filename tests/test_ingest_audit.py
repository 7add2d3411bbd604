"""Corrupt-record capture on JSON/CSV ingestion
(io/sources.py read_*_audited + split_quarantine + ingest_audit)."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from big_data_tools_spark.io.sources import (
    ingest_audit,
    read_csv_audited,
    read_json_audited,
    split_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


@pytest.fixture()
def json_path(tmp_path):
    p = tmp_path / "feed.json"
    p.write_text(
        '{"id": 1, "name": "ok", "score": 1.5}\n'
        '{"id": 2, "name": "also ok", "score": 2.0}\n'
        'this is not json at all\n'
        '{"id": "NaN-ish", "name": 3, "score": "x"\n'
    )
    return str(p)


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(
        "id,name,score\n"
        "1,ok,1.5\n"
        "oops,bad,not_a_number\n"
        "3,fine,3.25\n"
    )
    return str(p)


def test_json_corrupt_rows_captured(spark, json_path):
    df = read_json_audited(spark, json_path, SCHEMA)
    clean, bad = split_quarantine(df)
    assert {r["id"] for r in clean.collect()} == {1, 2}
    raw = [r["raw_record"] for r in bad.collect()]
    assert len(raw) == 2
    assert any("not json" in r for r in raw)
    # quarantine keeps the ORIGINAL text for replay after a fix
    assert any(r.startswith('{"id": "NaN-ish"') for r in raw)


def test_json_audit_counts(spark, json_path):
    row = ingest_audit(read_json_audited(spark, json_path, SCHEMA)).collect()[0]
    assert (row["n_rows"], row["n_corrupt"]) == (4, 2)
    assert row["corrupt_pct"] == 50.0
    assert row["n_id_parsed"] == 2


def test_quarantine_cache_released(spark, json_path):
    from big_data_tools_spark.operators.cache import (
        release_all_caches,
        release_caches,
    )

    release_all_caches()  # sweep parses persisted by sibling tests
    clean, bad = split_quarantine(read_json_audited(spark, json_path, SCHEMA))
    clean.count(), bad.count()
    release_caches(clean)
    release_caches(bad)
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() == 0


def test_csv_corrupt_rows_captured(spark, csv_path):
    df = read_csv_audited(spark, csv_path, SCHEMA)
    clean, bad = split_quarantine(df)
    assert {r["id"] for r in clean.collect()} == {1, 3}
    raw = [r["raw_record"] for r in bad.collect()]
    assert raw == ["oops,bad,not_a_number"]


def test_schema_collision_rejected(spark, json_path):
    clash = T.StructType(
        [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    with pytest.raises(ValueError):
        read_json_audited(spark, json_path, clash)
    with pytest.raises(ValueError):
        read_csv_audited(spark, json_path, clash)
