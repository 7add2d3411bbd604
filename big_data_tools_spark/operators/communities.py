"""Deterministic synchronous label propagation (Raghavan et al. 2007,
"Near linear time algorithm to detect community structures in
large-scale networks") — community detection, completing the graph
family next to PageRank (operators/pagerank.py), degree-ordered
triangles, and min-label connected components
(operators/components.py).

Classic LPA is randomized (random update order, random tie-breaks);
this is the engine-friendly SYNCHRONOUS variant with a total order on
ties: every round, every node simultaneously adopts the label that is
most frequent among its neighbors, ties broken by the SMALLEST label.
That makes the result a pure function of the edge set — reproducible
across runs, partitionings, and cluster sizes, which is what a data
pipeline needs from a curation primitive (the stochastic variant's
run-to-run drift is a feature for exploration, a bug for lineage).

Scale shape, same as PageRank: the symmetrized edge list is
hash-partitioned on ``dst`` once and persisted by the caller; each
round is one join (labels onto edges), one (node, label) count
aggregate, and one per-node ``max_by`` argmax — both aggregates are
hash aggregations with map-side partial combine (no sort buffer; the
tie-break rides inside the max_by struct), so a round costs 2
shuffles. Fixed ``iterations`` compose into ONE static plan with no
driver synchronization (label propagation stabilizes in a handful of
rounds on social-style graphs; a fixpoint loop would re-introduce
per-round driver sync for little gain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """(node, community_id) from an undirected graph given as a
    SYMMETRIZED edge list ``(src, dst)`` (both directions present, so
    ``src`` ranges over every node). ``community_id`` is the label the
    node holds after ``iterations`` synchronous rounds; labels
    initialize to the node id."""
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(iterations):
        neigh = edges.join(labels, edges.dst == labels.node).select(
            edges.src.alias("n"), "label"
        )
        # argmax by (count desc, label asc) as a hash aggregate:
        # max_by on (c, -label) picks max count, then the SMALLEST
        # label among ties — same total order the windowed row_number
        # form encodes, without its per-partition sort
        labels = (
            neigh.groupBy("n", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("n")
            .agg(
                F.max_by(
                    "label", F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                ).alias("label")
            )
            .select(F.col("n").alias("node"), "label")
        )
    return labels.select("node", F.col("label").alias("community_id"))
