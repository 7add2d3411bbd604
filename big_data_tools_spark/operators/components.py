"""Connected components over near-dup pairs — the step that turns
PAIRS (from Jaccard/MinHash/SimHash/cosine tiers) into dedup GROUPS:
one canonical doc per transitively-connected cluster.

Algorithm: alternating large-star/small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014) —
O(log^2 n) rounds worst-case, 2-4 in practice on dedup graphs, and
the edge set CONTRACTS toward a star forest every round, so late
rounds are nearly free. This replaced the r1-r9 min-label
propagation, whose round count is O(component diameter) and whose
join input stays the FULL edge list every round: on a
boilerplate-heavy crawl the duplicate-pair graph grows dense hub
components whose edge multiplicity (not diameter) made the fixpoint
the worst scaler in the r9 sf1 sweep.

  - large-star: every node u connects its LARGER neighbors to
    m(u) = min(N(u) + u). Kills long chains (pointer-jumping
    effect) while keeping every edge child > parent.
  - small-star: every node u connects its smaller-or-equal
    neighbors AND itself to m(u). Merges the partial stars.

Both steps preserve the component partition and only ever lower a
node's parent, so the unique fixpoint is the star forest whose
centers are the component minima — the exact semantics of the DuckDB
recursive-CTE twin (min reachable id). Convergence is detected by an
(edge-count, xxhash64-sum) checksum, then VERIFIED exactly (each
child has one parent; no parent is a child) before returning, so a
checksum collision degrades to one wasted round, never to a wrong
answer.

Iterative fixpoints inherently sync once per round on the converged?
check (same shape as every ML fit); the per-round work is fully
distributed. ``localCheckpoint`` truncates lineage so plans stay
flat; swap for a reliable checkpoint dir on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: (child, parent) edges, child > parent.

    Joins are pinned shuffle-hash: both sides are O(V+E) frames whose
    post-agg stats the optimizer under-estimates, and an AQE broadcast
    promotion of a corpus-sized frame is a driver-OOM hazard at scale
    (observed live on the sf1 pair graph, where 10x duplicate
    multiplication grows the edge set ~100x past the estimate).
    """
    nbrs = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionByName(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        nbrs.join(mins.hint("shuffle_hash"), "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round over child>parent edges (large-star
    output): re-point every smaller neighbor and the key itself at
    the minimum. Output stays child > parent."""
    mins = edges.groupBy("a").agg(F.min("b").alias("m"))
    joined = edges.join(mins.hint("shuffle_hash"), "a")
    return (
        joined.filter(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .unionByName(mins.select("a", F.col("m").alias("b")))
        .distinct()
    )


def _is_star_forest(edges: DataFrame) -> bool:
    """Exact fixpoint test: every child has exactly ONE parent and no
    parent is itself a child — both checks over the (small, already
    materialized) candidate-converged edge frame."""
    multi_parent = (
        edges.groupBy("a").agg(F.count(F.lit(1)).alias("n")).filter("n > 1")
    )
    if multi_parent.limit(1).count() > 0:
        return False
    parent_is_child = edges.select("b").join(
        edges.select(F.col("a").alias("b")), "b", "left_semi"
    )
    return parent_is_child.limit(1).count() == 0


def _driver_components(spark, rows, id_type):
    """Union-find over a COLLECTED edge list (bounded by
    ``small_graph_max_edges`` before the collect): min-id root per
    component, exactly the distributed fixpoint's semantics."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row["a"], row["b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for node in parent:
        r = find(node)
        m = comp_min.get(r)
        if m is None or node < m:
            comp_min[r] = node
    data = [(n, comp_min[find(n)]) for n in parent]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("node", id_type, True),
            T.StructField("comp", id_type, True),
        ]
    )
    return spark.createDataFrame(data, schema)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    trace: list | None = None,
    small_graph_max_edges: int | None = 100_000,
    self_loops: bool = True,
) -> DataFrame:
    """(node, component_id) for every node appearing in ``pairs``;
    component_id = min node id reachable through the pair graph.
    Self-pairs (``src == dst``) carry no connectivity but the node
    still gets a row — a singleton component — so the "every node
    appearing in pairs" contract survives the self-loop filter
    (r10 ADVICE: the star-contraction rewrite silently dropped them).

    ``self_loops=False`` is the r11 optimization contract for callers
    that can PROVE their pair stream is strict (``src < dst`` on every
    row — every dedup tier in this package emits exactly that): the
    singleton probe scans ``pairs`` a SECOND time for ``src == dst``
    rows, and because only the deduped edge frame is checkpointed,
    that probe re-executes the caller's entire upstream pair pipeline
    (measured r11: ~1s of the 3.3s dedup_components wall at sf0.1 —
    one full extra pass over the pair stream at scale). With strict
    pairs the probe is provably empty, so skipping it changes nothing
    but the wasted pass.

    Alternating large-star/small-star contraction (module docstring).
    Pass a list as ``trace`` to receive one dict per round —
    ``{"round", "n_nodes", "n_edges"}`` measured AFTER the round's
    contraction — the same shrink-visibility contract as
    ``kcore_peel_trace`` / ``pagerank_trace`` (those build the trace
    plan-side because their round count is fixed; a fixpoint's is
    data-dependent, so the trace rides the counts the convergence
    check already pays for).

    SMALL-GRAPH FAST PATH (r11): when the deduped edge set has at most
    ``small_graph_max_edges`` rows (and no ``trace`` was asked for),
    the edges are collected and union-find runs driver-side — the
    star rounds' fixed per-round cost (two joins, a distinct, an
    eager localCheckpoint, a convergence agg) is ~1.2s of pure
    overhead on a hundred-pair graph (measured r11: 2.8s star vs
    driver union-find at milliseconds on semdedup's sf0.1 pair set),
    and near-dup closures at small SF are exactly that shape. The
    collect is BOUNDED by the explicit threshold (100k edges ~ a few
    MB); any corpus whose pair graph exceeds it — every real crawl —
    takes the distributed contraction unchanged, and the result is a
    broadcastable local relation either way.
    """
    edges = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    fast = None
    if trace is None and small_graph_max_edges is not None:
        # count first (an agg over the checkpointed frame, no data
        # movement) so an over-threshold graph never ships 100k rows
        # to the driver just to discover it must go distributed
        if edges.count() <= small_graph_max_edges:
            fast = _driver_components(
                pairs.sparkSession, edges.collect(), pairs.schema[src].dataType
            )
    if fast is not None:
        out = fast
    else:
        out = _star_contraction_components(edges, max_iterations, trace)
    if not self_loops:
        return out.select("node", F.col("comp").alias("component_id"))
    # self-loop-only nodes: filtered out of the edge set up front, so
    # anti-join them back as singletons against the deduped edge
    # frame's node set
    self_nodes = (
        pairs.filter(F.col(src) == F.col(dst))
        .select(F.col(src).alias("node"))
        .distinct()
    )
    covered = edges.select(F.col("a").alias("node")).unionByName(
        edges.select(F.col("b").alias("node"))
    )
    singletons = self_nodes.join(covered, "node", "left_anti").withColumn(
        "comp", F.col("node")
    )
    return out.unionByName(singletons).select(
        "node", F.col("comp").alias("component_id")
    )


def _star_contraction_components(
    edges: DataFrame, max_iterations: int, trace: list | None
) -> DataFrame:
    """The distributed fixpoint over a deduped, checkpointed
    child>parent edge frame; returns (node, comp) for every edge
    node."""
    prev_sig: tuple[int, int] | None = None
    converged = False
    for i in range(1, max_iterations + 1):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        row = edges.agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.coalesce(
                # decimal sum: a bigint sum of 64-bit hashes overflows
                # (ANSI ARITHMETIC_OVERFLOW); decimal(38,0) is exact
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("sig"),
        ).first()
        sig = (row["n_edges"], row["sig"])
        if trace is not None:
            n_nodes = (
                edges.select(F.col("a").alias("node"))
                .unionByName(edges.select(F.col("b").alias("node")))
                .distinct()
                .count()
            )
            trace.append(
                {"round": i, "n_nodes": n_nodes, "n_edges": sig[0]}
            )
        if sig == prev_sig and _is_star_forest(edges):
            converged = True
            break
        prev_sig = sig
    if not converged and not _is_star_forest(edges):
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds — raise max_iterations (alternating star contraction "
            "needs O(log^2 n) rounds worst-case, 2-4 typical)"
        )
    roots = (
        edges.select(F.col("b").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    children = edges.select(
        F.col("a").alias("node"), F.col("b").alias("comp")
    )
    return children.unionByName(roots)
