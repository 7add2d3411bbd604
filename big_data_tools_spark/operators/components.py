"""Connected components over near-dup pairs — the step that turns
PAIRS (from Jaccard/MinHash/SimHash/cosine tiers) into dedup GROUPS:
one canonical doc per transitively-connected cluster.

Algorithm: iterative min-label propagation. Each node starts labeled
with its own id; every iteration each node takes the min of its label
and its neighbors' labels; converges when no label changes — O(cluster
diameter) iterations, and near-dup clusters are shallow (most are
pairs/triangles), so 3-5 iterations typical. Each iteration is one
join + one aggregate; ``localCheckpoint`` truncates lineage so plans
stay flat. The O(log n)-round upgrade for adversarial graphs is
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014) — same join shape, not needed for
dedup-shaped graphs.

Iterative fixpoints inherently sync once per round on the converged?
count (same shape as every ML fit); the per-round work is fully
distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component_id) for every node appearing in ``pairs``;
    component_id = min node id reachable through the pair graph."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        # shuffle-hash pinned: both sides are O(V+E) frames, so an AQE
        # broadcast promotion (stats under-estimate after the agg) is a
        # driver-OOM hazard at scale — observed live on the sf1 pair
        # graph, where 10x duplicate multiplication grows the edge set
        # ~100x past what the optimizer expects
        neigh = (
            edges.join(labels.hint("shuffle_hash"), edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
        )
        proposed = (
            labels.join(neigh.hint("shuffle_hash"), labels.node == neigh.a, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("ncomp", F.col("comp"))).alias("comp"),
                F.col("comp").alias("old_comp"),
            )
        ).localCheckpoint()
        changed = proposed.filter(F.col("comp") != F.col("old_comp")).count()
        labels = proposed.select("node", "comp")
        if changed == 0:
            break
    return labels.select("node", F.col("comp").alias("component_id"))
