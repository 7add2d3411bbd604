"""PageRank operator tests: hand-computed ranks on a path graph, mass
conservation, and determinism (round 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_tools_spark.operators.pagerank import pagerank, transition_edges
from big_data_tools_spark.queries import get


def _path_graph(spark):
    # undirected path A(1) - B(2) - C(3), unit weights, both directions
    undirected = [(1, 2, 1), (2, 3, 1)]
    edges = [(a, b, w) for a, b, w in undirected] + [
        (b, a, w) for a, b, w in undirected
    ]
    return transition_edges(spark.createDataFrame(edges, ["src", "dst", "w"]))


def test_pagerank_matches_hand_computation(spark):
    """Two iterations on the path graph, worked by hand:
    iter1: ends 0.15+0.85*0.5 = 0.575, middle 0.15+0.85*2 = 1.85
    iter2: ends 0.15+0.85*(1.85*0.5) = 0.93625, middle 0.15+0.85*1.15
    (all products land exactly on the 1e-6 quantization grid)."""
    edges = _path_graph(spark)
    r1 = {r["node"]: r["rank"] for r in pagerank(edges, 1).collect()}
    assert r1 == {1: 0.575, 2: 1.85, 3: 0.575}
    r2 = {r["node"]: r["rank"] for r in pagerank(edges, 2).collect()}
    assert r2 == {1: 0.93625, 2: 1.1275, 3: 0.93625}


def test_pagerank_conserves_mass(spark):
    """On an undirected graph (no dangling nodes) total rank stays
    ~|V|: each iteration redistributes rank and the damping re-injects
    what it removed; the floor quantization can only leak ≤1e-6 per
    edge per iteration."""
    edges = _path_graph(spark)
    for k in (1, 3, 5):
        total = sum(r["rank"] for r in pagerank(edges, k).collect())
        assert total == pytest.approx(3.0, abs=1e-4), k


def test_pagerank_is_deterministic_across_runs(spark, sf_smoke):
    q = get("part_copurchase_pagerank").fn
    a = [tuple(r) for r in q(spark, sf_smoke).collect()]
    b = [tuple(r) for r in q(spark, sf_smoke).collect()]
    assert a == b
    assert len(a) == 20
    # hub parts outrank the default floor
    assert all(rank > 0 for _, rank in a)
    ranks = [rank for _, rank in a]
    assert ranks == sorted(ranks, reverse=True)

def test_triangle_stats_on_k4(spark):
    """Complete graph K4: 6 edges, C(4,3)=4 triangles; the oriented
    wedge count equals the triangle-closure candidates."""
    from big_data_tools_spark.queries.graph import triangle_stats

    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    und = spark.createDataFrame(edges, ["a", "b"])
    row = triangle_stats(und).collect()[0]
    assert row["n_edges"] == 6
    assert row["n_triangles"] == 4


def test_triangle_stats_on_path(spark):
    from big_data_tools_spark.queries.graph import triangle_stats

    und = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["a", "b"])
    row = triangle_stats(und).collect()[0]
    assert row["n_edges"] == 3
    assert row["n_triangles"] == 0


def test_leakage_safe_split_never_straddles(spark, sf_smoke):
    """Same content fingerprint => same split, by construction; and
    the hash split lands near 80/10/10 at corpus size."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.sampling import md5_uniform
    from big_data_tools_spark.operators.text import fingerprint
    from big_data_tools_spark.queries.curation import _SPLIT_SALT

    docs = load_table(spark, sf_smoke, "documents")
    s = docs.select(fingerprint(F.col("text")).alias("fp")).select(
        "fp",
        F.when(md5_uniform(F.col("fp"), _SPLIT_SALT) < 0.8, "train")
        .when(md5_uniform(F.col("fp"), _SPLIT_SALT) < 0.9, "val")
        .otherwise("test")
        .alias("split"),
    )
    assert (
        s.select("fp", "split").distinct().count()
        == s.select("fp").distinct().count()
    )
    total = docs.count()
    by_split = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0.7 < by_split.get("train", 0) / total < 0.9


def test_pagerank_trace_movement_decays(spark):
    """Convergence telemetry on a small fixture: total rank movement
    must decay monotonically (damped fixpoint iteration on a connected
    graph), max <= l1, and iterations are 1..k exactly."""
    from big_data_tools_spark.operators.pagerank import (
        pagerank_trace,
        transition_edges,
    )

    und = [(1, 2, 1), (2, 3, 1), (3, 1, 1), (3, 4, 2), (4, 1, 1)]
    rows = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    edges = transition_edges(
        spark.createDataFrame(rows, "src long, dst long, w long")
    ).persist()
    trace = {r["iteration"]: r for r in pagerank_trace(edges, 4).collect()}
    assert set(trace) == {1, 2, 3, 4}
    l1 = [trace[i]["l1_delta_e9"] for i in (1, 2, 3, 4)]
    assert l1 == sorted(l1, reverse=True), l1
    assert l1[-1] < l1[0] / 3  # 4 damped rounds shed most of the movement
    for i in (1, 2, 3, 4):
        assert 0 <= trace[i]["max_delta_e9"] <= trace[i]["l1_delta_e9"]
    edges.unpersist()
