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