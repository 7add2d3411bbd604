"""Deterministic synchronous LPA: hand-pinned community structures,
determinism, and the registry query's shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_tools_spark.operators.communities import label_propagation
from big_data_tools_spark.queries import get


def _sym_edges(spark, und_pairs):
    rows = [(a, b) for a, b in und_pairs] + [(b, a) for a, b in und_pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_barbell_splits_into_its_two_cliques(spark):
    """Two triangles joined by one bridge edge: each clique converges
    to one label and the bridge does not merge them."""
    edges = _sym_edges(
        spark, [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    )
    got = {
        r["node"]: r["community_id"]
        for r in label_propagation(edges, iterations=5).collect()
    }
    assert len(got) == 6
    left = {got[1], got[2], got[3]}
    right = {got[4], got[5], got[6]}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_clique_converges_to_min_label_and_is_deterministic(spark):
    clique = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    edges = _sym_edges(spark, clique)
    one = sorted(tuple(r) for r in label_propagation(edges, 5).collect())
    two = sorted(tuple(r) for r in label_propagation(edges, 5).collect())
    assert one == two
    labels = {lab for _, lab in one}
    assert labels == {10}, labels  # min-label tie-break wins the clique


def test_copurchase_communities_query_runs(spark, sf_smoke):
    out = get("part_copurchase_communities").fn(spark, sf_smoke).collect()
    assert 0 < len(out) <= 20
    sizes = [r["n_parts"] for r in out]
    assert sizes == sorted(sizes, reverse=True)
    assert all(s >= 1 for s in sizes)


def test_lpa_trace_reaches_fixpoint_on_clique(spark):
    """On a 5-clique the synchronous dynamics are exact: round 1 every
    node moves (node 10's neighbors all hold distinct labels, min 11;
    everyone else sees 10), round 2 node 10 rejoins the majority, and
    the trace must show the fixpoint with 0 further movement."""
    from big_data_tools_spark.operators.communities import label_propagation_trace

    clique = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    edges = _sym_edges(spark, clique)
    rows = {r["round"]: r for r in label_propagation_trace(edges, 3).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["labels_changed"] == 5  # 10->11, others ->10
    assert rows[1]["n_communities"] == 2
    assert rows[2]["labels_changed"] == 1  # node 10 rejoins
    assert rows[2]["n_communities"] == 1
    assert rows[3]["labels_changed"] == 0


def test_lpa_trace_final_round_matches_label_propagation(spark):
    """The trace's community count after the last round must equal
    what label_propagation itself produces for the same k."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.operators.communities import (
        label_propagation,
        label_propagation_trace,
    )

    edges = _sym_edges(
        spark, [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    )
    trace = {r["round"]: r for r in label_propagation_trace(edges, 4).collect()}
    n_final = (
        label_propagation(edges, 4)
        .agg(F.count_distinct("community_id").alias("n"))
        .collect()[0]["n"]
    )
    assert trace[4]["n_communities"] == n_final
