"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names/order-insensitive
values. Used by tests/test_oracle_parity.py so oracle drift is caught
locally before the driver's t2 gate.
"""

from __future__ import annotations

import math
import os

import duckdb

from big_data_tools_spark.io.schemas import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full repr precision, sign of zero PRESERVED: the driver's
        # value hash distinguishes -0.0 from 0.0 (r8 corpus_heaps_beta
        # FAIL — Spark round() drops a zero's sign, DuckDB keeps it),
        # so collapsing here would keep that class invisible locally.
        return repr(v)
    return repr(v)


def rowset(cols, rows) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return tuple(sorted("|".join(_norm(r[i]) for i in order) for r in rows))


def compare(spark, spec, sf_dir: str) -> tuple[bool, str]:
    from big_data_tools_spark.operators.cache import release_all_caches, release_caches

    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    release_caches(sdf)  # free operator-persisted intermediates
    release_all_caches()  # ...including tags dropped by query wrappers

    con = duckdb_connect(sf_dir)
    cur = con.execute(spec.sql)
    dcols = [d[0] for d in cur.description]
    drows = [tuple(r) for r in cur.fetchall()]

    if sorted(scols) != sorted(dcols):
        return False, f"columns differ: spark={sorted(scols)} duckdb={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row counts differ: spark={len(srows)} duckdb={len(drows)}"
    a, b = rowset(scols, srows), rowset(dcols, drows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ, first diffs: {diff}"
    return True, "ok"
