"""Every registered query with an oracle twin must hash-match DuckDB
on the same parquet — the local replica of the driver's t2 gate.

Runs at sf0.001 by default (fast); set BDT_PARITY_SF=/root/testdata/sf0.01
to run at the driver's correctness scale.
"""

from __future__ import annotations

import os

import pytest

from big_data_tools_spark.queries import all_queries

from .oracle import compare

SF = os.environ.get("BDT_PARITY_SF", "/root/testdata/sf0.001")

SQL_SPECS = [spec for spec in all_queries().values() if spec.sql is not None]
ROWS_ONLY = [spec for spec in all_queries().values() if spec.sql is None]


@pytest.mark.parametrize("spec", SQL_SPECS, ids=[s.name for s in SQL_SPECS])
def test_oracle_parity(spark, spec):
    ok, msg = compare(spark, spec, SF)
    assert ok, f"{spec.name}: {msg}"


@pytest.mark.parametrize("spec", ROWS_ONLY, ids=[s.name for s in ROWS_ONLY])
def test_rows_only_runs(spark, spec):
    from big_data_tools_spark.operators.cache import release_all_caches, release_caches

    df = spec.fn(spark, SF)
    assert df.count() >= 0
    assert len(df.columns) > 0
    release_caches(df)
    release_all_caches()
