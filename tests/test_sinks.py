"""Sink round-trip tests: partitioned parquet write -> read-back equality."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from big_data_tools_spark.io.sinks import read_back, write_parquet
from big_data_tools_spark.queries import get


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="bdt_sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_parquet_roundtrip(spark, sf_smoke, outdir):
    df = get("pricing_summary").fn(spark, sf_smoke)
    write_parquet(df, outdir)
    back = read_back(spark, outdir)
    assert sorted(back.columns) == sorted(df.columns)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_partitioned_write_produces_partition_dirs(spark, sf_smoke, outdir):
    df = get("priority_recode").fn(spark, sf_smoke)
    write_parquet(df, outdir, partition_by=["urgency"])
    subdirs = {p for p in os.listdir(outdir) if p.startswith("urgency=")}
    assert subdirs == {"urgency=high", "urgency=medium", "urgency=low"}
    back = read_back(spark, outdir)
    assert back.count() == df.count()
