"""Round-5 additions: k-core peeling, CUSUM changepoints, bigram
stupid-backoff scoring, Zipf fit — fixture dynamics pinned by hand,
plus Python replications of the sequential recurrences (the
registry-level DuckDB twins are exercised by test_oracle_parity)."""

from __future__ import annotations

import duckdb

from big_data_tools_spark.operators.kcore import kcore_peel_trace, kcore_trace_sql
from big_data_tools_spark.queries import get

# path 1-2-3-4-5 plus triangle 6-7-8: the 2-core is exactly the
# triangle, reached after three peel rounds (endpoints, then the
# stranded path middles, then the isolated node 3)
_PLANT_EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (6, 8), (7, 8)]
_PLANT_TRACE = [
    (1, 6, 5, 2),  # endpoints 1 and 5 peel
    (2, 4, 3, 2),  # path middles 2 and 4 peel, stranding 3
    (3, 3, 3, 1),  # 3 is edgeless -> degree 0 -> peels
    (4, 3, 3, 0),  # fixpoint: the triangle IS the 2-core
    (5, 3, 3, 0),
]


def test_kcore_planted_graph(spark):
    und = spark.createDataFrame(_PLANT_EDGES, "a int, b int")
    got = sorted(
        tuple(r) for r in kcore_peel_trace(und, k=2, rounds=5).collect()
    )
    assert got == _PLANT_TRACE


def test_kcore_sql_twin_matches_planted_graph():
    values = ", ".join(f"({a}, {b})" for a, b in _PLANT_EDGES)
    cte = f"und AS (SELECT * FROM (VALUES {values}) t(a, b))"
    rows = duckdb.sql(
        kcore_trace_sql(cte, k=2, rounds=5) + "SELECT * FROM trace ORDER BY round"
    ).fetchall()
    assert [tuple(r) for r in rows] == _PLANT_TRACE


def test_kcore_validates_args(spark):
    und = spark.createDataFrame(_PLANT_EDGES, "a int, b int")
    for bad in ({"k": 0}, {"rounds": 0}):
        try:
            kcore_peel_trace(und, **{"k": 2, "rounds": 3, **bad})
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


def test_cusum_matches_python_replication(spark, sf_smoke):
    from big_data_tools_spark.queries.timeseries import _CUSUM_H, _CUSUM_K

    daily = duckdb.sql(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS y
        FROM '{sf_smoke}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    ys = [y for _, y in daily]
    n = len(ys)
    mean = sum(ys) / n  # replication only; query uses exact decimal sums
    var = (sum(v * v for v in ys) - n * mean * mean) / (n - 1)
    std = var ** 0.5
    sp = sn = 0.0
    want = {}
    for day, y in daily:
        z = round((y - mean) / std, 6)
        sp = round(max(0.0, sp + z - _CUSUM_K), 6)
        sn = round(max(0.0, sn - z - _CUSUM_K), 6)
        want[day] = (z, sp, sn, 1 if sp > _CUSUM_H or sn > _CUSUM_H else 0)
    rows = get("daily_revenue_cusum").fn(spark, sf_smoke).collect()
    assert len(rows) == n
    for r in rows:
        z, sp, sn, alarm = want[r["day"]]
        assert abs(r["zscore"] - z) < 1e-4, r
        assert abs(r["cusum_pos"] - sp) < 1e-3, r
        assert abs(r["cusum_neg"] - sn) < 1e-3, r


def test_bigram_backoff_properties(spark, sf_smoke):
    rows = {r["lang"]: r for r in get("doc_bigram_backoff_nll").fn(spark, sf_smoke).collect()}
    assert set(rows) == {"en", "de", "fr", "es", "zh"}
    for r in rows.values():
        assert r["n_docs"] > 0 and r["n_bigrams"] > r["n_docs"]
        assert 0.0 <= r["backoff_rate"] < 1.0
        assert r["avg_nll"] > 0.0
    # the held-out split must actually hold documents out: scored docs
    # are a strict subset of the corpus
    n_docs_total = spark.read.parquet(f"{sf_smoke}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows.values()) < n_docs_total


def test_zipf_fit_properties(spark, sf_smoke):
    row = get("corpus_zipf_fit").fn(spark, sf_smoke).collect()[0]
    assert row["n_points"] >= 10
    assert row["zipf_slope"] < 0.0  # frequency decreases with rank
    assert 0.0 <= row["r2"] <= 1.0
    # the synthetic corpus draws words near-uniformly, so the fit must
    # NOT look Zipfian — exactly the diagnostic the query exists for
    assert row["zipf_slope"] > -0.5
