"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023).

The trick that makes embedding dedup tractable at 100 TB: never score
all pairs. KMeans partitions the corpus into k clusters; semantic
duplicates land in the same cluster (they are near-identical vectors),
so pairwise cosine only runs WITHIN clusters — cost sum(m_i^2) with
m_i ~ n/k, i.e. n^2/k instead of n^2. Size k so the expected cluster
fits one task (the paper uses k=11k for 5B docs) and the quadratic is
bounded by construction; a ``max_cluster_size`` guard fails loudly on
degenerate fits instead of silently exploding a task.

Cluster QUALITY barely matters — a near-duplicate pair is two almost
identical vectors, and any Lloyd fixpoint from any init assigns them
together unless they straddle a boundary — so the fit runs with
random init and few iterations (each saved k-means|| init step and
Lloyd iteration is a full corpus pass).

Spark shape: seeded KMeans fit (few passes) -> self-join on
cluster_id (one shuffle, co-partitioned both sides) -> exact cosine on
candidate pairs -> min-label connected components to turn pairs into
keep/drop groups. Everything after the fit is pure Catalyst;
rows-only for the driver (seeded MLlib fit has no SQL twin), recall
and determinism pinned in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import track_cache
from .components import connected_components
from .similarity import IvfIndex


def _pairs_from_index(
    index: IvfIndex,
    threshold: float,
    max_cluster_size: int | None,
    round_digits: int | None,
) -> DataFrame:
    assigned = index._assigned  # (neighbor_id, c_vec, cluster_id), persisted
    if max_cluster_size is not None:
        worst = (
            assigned.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(F.max("m"))
            .first()[0]
            or 0
        )
        if worst > max_cluster_size:
            raise ValueError(
                f"largest KMeans cluster has {worst} members "
                f"(> max_cluster_size={max_cluster_size}); the within-cluster "
                "pair scan would be quadratic in that. Raise n_clusters so "
                "expected cluster size fits a task, or raise the guard."
            )
    # norms hoisted to per-ROW projections on each self-join side:
    # cosine() inside the join recomputes both L2 norms per CANDIDATE
    # PAIR — 3x the element work of the dot alone (r11; same hoist as
    # IvfIndex.search). Identical expression tree, bit-identical sims.
    from .similarity import _as_double, dot, l2_norm

    # the float->double cast rides the same hoist: casting inside
    # dot() would re-allocate both arrays per pair
    a = assigned.select(
        "cluster_id",
        F.col("neighbor_id").alias("id_a"),
        _as_double(F.col("c_vec")).alias("va"),
        l2_norm(F.col("c_vec")).alias("na"),
    )
    b = assigned.select(
        "cluster_id",
        F.col("neighbor_id").alias("id_b"),
        _as_double(F.col("c_vec")).alias("vb"),
        l2_norm(F.col("c_vec")).alias("nb"),
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int | str = "auto",
    max_cluster_size: int | None = 100_000,
    round_digits: int | None = 4,
    fit_sample_cap: int | None = 100_000,
    auto_rows_per_cluster: int = 2048,
) -> DataFrame:
    """(id_a < id_b, cos_sim) pairs with cosine >= ``threshold``,
    candidates restricted to same-KMeans-cluster pairs.

    ``fit_sample_cap`` bounds what the Lloyd iterations scan (the
    paper's own protocol — centroids come from a subset, the full
    corpus only gets the one assignment pass); identity below the cap,
    so small-SF results are bit-identical to the full fit."""
    index = IvfIndex.fit(
        corpus, id_col, vec_col, n_clusters, max_iter=8, init_mode="random",
        fit_sample_cap=fit_sample_cap, auto_rows_per_cluster=auto_rows_per_cluster,
        fit_rows_per_centroid=200,
    )
    pairs = _pairs_from_index(index, threshold, max_cluster_size, round_digits)
    return track_cache(pairs, index._assigned)


def semantic_dedup_groups(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int | str = "auto",
    max_cluster_size: int | None = 100_000,
    fit_sample_cap: int | None = 100_000,
    auto_rows_per_cluster: int = 2048,
    index: IvfIndex | None = None,
) -> DataFrame:
    """(id, keep_id) for every vector in a semantic-duplicate group;
    keep_id = min id in the group (transitive closure over pairs, so a
    chain a~b~c collapses to one survivor even if cos(a,c) dips below
    the threshold).

    Pass a pre-fitted ``index`` (typically :meth:`IvfIndex.load`-ed
    from a nightly fit) to skip the per-run KMeans entirely — the
    fit dominates the one-shot wall at scale (SCALING.md, IvfIndex
    amortization); identical output when given the index this call
    would have fitted (pinned in tests/test_dedup.py)."""
    if index is None:
        index = IvfIndex.fit(
            corpus, id_col, vec_col, n_clusters, max_iter=8, init_mode="random",
            fit_sample_cap=fit_sample_cap, auto_rows_per_cluster=auto_rows_per_cluster,
            fit_rows_per_centroid=200,
        )
    return semantic_dedup_groups_from_index(
        index, id_col=id_col, threshold=threshold,
        max_cluster_size=max_cluster_size,
    )


def semantic_dedup_groups_from_index(
    index: IvfIndex,
    id_col: str = "vec_id",
    threshold: float = 0.95,
    max_cluster_size: int | None = 100_000,
) -> DataFrame:
    """The amortized path: dedup over a PRE-FITTED (typically
    :meth:`IvfIndex.load`-ed) index. The per-run KMeans fit dominates
    ``semantic_dedup_groups`` wall time (SCALING.md measured x6.4 at
    sf1); a nightly embedding pipeline fits + saves once and every
    incremental dedup run loads the index and pays only the clustered
    self-join + components fixpoint. Same output as the one-shot form
    when given the index it would have fitted."""
    # the components fixpoint consumes the pair set once per round
    # (union both directions + every iteration's join) — persist it so
    # the clustered self-join runs once, not 2+rounds times
    pairs = _pairs_from_index(index, threshold, max_cluster_size, None).persist()
    # pairs are strict (id_a < id_b) -> no self-loop probe needed
    comps = connected_components(pairs, "id_a", "id_b", self_loops=False)
    out = comps.select(
        F.col("node").alias(id_col), F.col("component_id").alias("keep_id")
    )
    return track_cache(out, index._assigned, pairs)
