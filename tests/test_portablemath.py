"""Bit-equality pins for operators/portablemath.py.

The round-6 driver hash failures (corpus_heaps_fit, ml_features_split)
were environment-sensitivity bugs: libm transcendentals and raw-double
sum order differ between engines/boxes. portablemath removes libm from
every twinned surface; these tests pin the property the whole design
rests on — the SAME SQL string produces the SAME 64 bits in Spark and
DuckDB — plus accuracy against Python's libm as a sanity band.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from big_data_tools_spark.operators.portablemath import (
    pexp_sql,
    pln_ratio_sql,
    pln_sql,
    plog2_sql,
)


def _duck(sql: str) -> np.ndarray:
    return duckdb.connect().execute(sql).fetchnumpy()["v"]


def _bits(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64).view("int64")


def test_pln_accuracy_duckdb():
    rows = duckdb.connect().execute(
        f"SELECT n, {pln_sql('n')} AS v FROM "
        "(SELECT CAST(range + 1 AS BIGINT) AS n FROM range(50000))"
    ).fetchall()
    worst = max(abs(v - math.log(n)) for n, v in rows)
    assert worst < 1e-12, worst


def test_pln_near_bigint_max_exact():
    # exponent extraction + exact 2^e product must hold at 62 bits
    rows = duckdb.connect().execute(
        f"SELECT n, {pln_sql('n')} AS v FROM "
        "(SELECT CAST(4611686018427387000 - range AS BIGINT) AS n FROM range(64))"
    ).fetchall()
    worst = max(abs(v - math.log(n)) for n, v in rows)
    assert worst < 1e-12, worst


def test_pln_bit_identical_spark_vs_duckdb(spark):
    expr = pln_sql("n")
    n_hi = 200_000
    duck = _duck(
        f"SELECT {expr} AS v FROM "
        f"(SELECT CAST(range + 1 AS BIGINT) AS n FROM range({n_hi}))"
    )
    sp = (
        spark.range(1, n_hi + 1)
        .selectExpr("id AS n")
        .selectExpr("n", f"{expr} AS v")
        .toPandas()
        .sort_values("n")["v"]
        .to_numpy()
    )
    assert np.count_nonzero(_bits(sp) != _bits(duck)) == 0


def test_pln_bit_identical_sparse_large(spark):
    # 10k pseudo-random 50-bit integers (deterministic congruential walk)
    expr = pln_sql("n")
    gen = "SELECT CAST(1 + (range * 1103515245 + 12345) % 1125899906842624 AS BIGINT) AS n FROM range(10000)"
    duck = _duck(f"SELECT {expr} AS v FROM ({gen}) WHERE n >= 1 ORDER BY n")
    sp = (
        spark.range(0, 10000)
        .selectExpr(
            "CAST(1 + (id * 1103515245 + 12345) % 1125899906842624 AS BIGINT) AS n"
        )
        .filter("n >= 1")
        .selectExpr("n", f"{expr} AS v")
        .toPandas()
        .sort_values("n")["v"]
        .to_numpy()
    )
    assert np.count_nonzero(_bits(np.sort(sp)) != _bits(np.sort(duck))) == 0


def test_pln_ratio_and_plog2(spark):
    expr = pln_ratio_sql("a", "b")
    l2 = plog2_sql("a")
    rows = duckdb.connect().execute(
        f"SELECT a, b, {expr} AS v, {l2} AS w FROM "
        "(SELECT CAST(range + 1 AS BIGINT) AS a, CAST(range + 7 AS BIGINT) AS b FROM range(2000))"
    ).fetchall()
    for a, b, v, w in rows:
        assert abs(v - math.log(a / b)) < 1e-12
        assert abs(w - math.log2(a)) < 1e-12


def test_pexp_accuracy_and_bits(spark):
    expr = pexp_sql("x")
    gen_sql = "(SELECT (range - 10000) / 250.0E0 AS x FROM range(20000))"
    rows = duckdb.connect().execute(f"SELECT x, {expr} AS v FROM {gen_sql}").fetchall()
    worst = max(abs(v - math.exp(x)) / math.exp(x) for x, v in rows)
    assert worst < 1e-13, worst
    duck = _duck(f"SELECT {expr} AS v FROM {gen_sql} ORDER BY x")
    sp = (
        spark.range(0, 20000)
        .selectExpr("(id - 10000) / 250.0E0 AS x")
        .selectExpr("x", f"{expr} AS v")
        .toPandas()
        .sort_values("x")["v"]
        .to_numpy()
    )
    assert np.count_nonzero(_bits(sp) != _bits(duck)) == 0


def test_literals_are_double_typed():
    # the round-7 regression that motivated E0 suffixes: a bare `2.0`
    # parses as DECIMAL in DuckDB (and Spark), silently changing the
    # arithmetic; every literal in the generated SQL must be exponent
    # notation so both engines type it DOUBLE.
    import re

    sql = pln_sql("n") + pexp_sql("x")
    bare = re.findall(r"\d+\.\d+(?![E\d])", sql)
    assert not bare, bare
