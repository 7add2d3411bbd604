"""HITS hubs & authorities (Kleinberg 1999, "Authoritative sources in
a hyperlinked environment") over a directed edge list — the third
member of the oracle-checked iterative-graph family next to PageRank
(operators/pagerank.py) and the LPA/k-core traces.

On the warehouse's natural DIRECTED bipartite graph (customer ->
part purchase edges) the two scores mean different things: hub(c)
measures a customer whose basket concentrates on authoritative parts,
authority(p) a part bought by strong hub customers — the
mutual-reinforcement pair PageRank's single score cannot express.

Engine-exact float policy (the pagerank.py recipe, which iteration
compounding demands): each propagation quantizes the incoming score
to ``floor(score * 1e6)`` BIGINT before summing (exact int64
arithmetic in any order), and the per-side normalization divides by
the side's MAX raw sum — an integer/integer division both engines
perform on bit-identical inputs, yielding bit-identical doubles. Max
normalization replaces the textbook L2 norm: same fixpoint direction
(scores are scale-free), no sqrt of an engine-ordered float sum. No
round() inside the loop => every iteration is bit-identical, so a
DuckDB twin with k unrolled CTE pairs hash-matches the distributed
run.

Scale shape: the edge list is hash-partitioned ONCE on each join key
side and persisted by the caller; every iteration is join +
aggregate on ``dst`` then join + aggregate on ``src`` (2 shuffles per
half-step, the Pregel cost) plus two scalar maxes (broadcast back —
singleton frames, never a data shuffle). The max-normalizer makes
each raw-sum frame a two-consumer node, so every half-step ends in a
``localCheckpoint`` materialization barrier (the components-fixpoint
recipe) — without it the logical plan doubles per half-step
(2^(2k) edge scans); with it the plan stays linear in k at the cost
of one job submission per half-step. The score frames are |V|-sized, so their
joins carry shuffle_hash hints — the round-5 sf1 sweep proved AQE
happily broadcast-promotes exactly this frame shape in the
components fixpoint, and a |V| broadcast is a driver OOM at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QUANT = 1_000_000


def hits(
    edges: DataFrame, iterations: int, checkpoint: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Fixed-iteration HITS over directed edges ``(src, dst)``
    (deduplicated by the caller). Returns ``(hubs, auths)`` frames:
    ``hubs(node, hub)`` over src nodes and ``auths(node, auth)`` over
    dst nodes, each max-normalized to [~0, 1]. ``checkpoint=False``
    skips the per-half-step lineage cut — ONLY safe at 1-2 iterations
    (plan doubles per half-step); the plan-pin test uses it to
    inspect the join strategy the checkpoints would otherwise hide."""
    if iterations < 1:
        # ADVICE r6: a zero-iteration call would return (hubs, None)
        # and crash the caller with an opaque AttributeError
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    hubs = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("hub")
    )
    # The hub half-step joins on dst; a caller-persisted src
    # partitioning would re-shuffle the FULL edge list every
    # iteration. One extra persisted copy, dst-partitioned, makes
    # both half-steps' edge sides shuffle-free for all k iterations
    # (k shuffles of |E| saved for one). Tagged onto the returned
    # frames so callers composing track_cache release it.
    edges_by_dst = (
        edges.repartition("dst").persist() if checkpoint else edges
    )
    auths = None
    for _ in range(iterations):
        # authority half-step: pull quantized hub mass along edges.
        # Quantization happens on the |V|-sized score frame BEFORE
        # the join (identical per-row result, |E| fewer floor/casts).
        # localCheckpoint is load-bearing: the raw-sum frame is
        # consumed TWICE (the max aggregate and the division), so an
        # unmaterialized lineage doubles per half-step — 2^(2k) edge
        # scans in the final plan. Checkpointing keeps the lineage
        # linear, same as the components fixpoint's per-round cut.
        hq = hubs.select(
            "node",
            F.floor(F.col("hub") * F.lit(float(_QUANT))).cast("bigint").alias("c"),
        )
        araw = (
            edges.join(hq.hint("shuffle_hash"), edges.src == hq.node)
            .groupBy("dst")
            .agg(F.sum("c").alias("araw"))
        )
        if checkpoint:
            araw = araw.localCheckpoint()
        amax = araw.agg(F.max("araw").alias("amax"))
        auths = araw.crossJoin(F.broadcast(amax)).select(
            F.col("dst").alias("node"),
            (F.col("araw") / F.col("amax")).alias("auth"),
        )
        # hub half-step: pull the fresh quantized authority mass back
        aq = auths.select(
            "node",
            F.floor(F.col("auth") * F.lit(float(_QUANT))).cast("bigint").alias("c"),
        )
        hraw = (
            edges_by_dst.join(aq.hint("shuffle_hash"), edges_by_dst.dst == aq.node)
            .groupBy("src")
            .agg(F.sum("c").alias("hraw"))
        )
        if checkpoint:
            hraw = hraw.localCheckpoint()
        hmax = hraw.agg(F.max("hraw").alias("hmax"))
        hubs = hraw.crossJoin(F.broadcast(hmax)).select(
            F.col("src").alias("node"),
            (F.col("hraw") / F.col("hmax")).alias("hub"),
        )
    if checkpoint:
        from .cache import track_cache

        hubs = track_cache(hubs, edges_by_dst)
        auths = track_cache(auths, edges_by_dst)
    return hubs, auths


def hits_sql(edges_cte: str, iterations: int) -> str:
    """DuckDB twin of :func:`hits`: ``iterations`` unrolled half-step
    CTE pairs over a caller-supplied CTE body defining ``edges(src,
    dst)``. Returns the WITH-clause prefix ending at ``hub{k}`` /
    ``auth{k}``; the caller appends its final SELECT."""
    if iterations < 1:
        # mirror hits(): a 0-iteration prefix would reference hub0 only
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    steps = [
        edges_cte,
        "hub0 AS MATERIALIZED (SELECT DISTINCT src AS node, "
        "CAST(1.0 AS DOUBLE) AS hub FROM edges)",
    ]
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and the
    # raw-sum CTEs are each referenced twice (max subquery + the
    # projection), so an inlined chain doubles per half-step — the
    # same 2^(2k) blowup the Spark side cuts with localCheckpoint.
    for i in range(iterations):
        steps.append(
            f"araw{i + 1} AS MATERIALIZED (SELECT e.dst AS node, "
            f"CAST(sum(CAST(floor(h.hub * {float(_QUANT)}) AS BIGINT)) "
            f"AS BIGINT) AS araw "
            f"FROM edges e JOIN hub{i} h ON e.src = h.node GROUP BY e.dst)"
        )
        steps.append(
            f"auth{i + 1} AS MATERIALIZED (SELECT node, "
            f"araw / (SELECT max(araw) FROM araw{i + 1}) AS auth "
            f"FROM araw{i + 1})"
        )
        steps.append(
            f"hraw{i + 1} AS MATERIALIZED (SELECT e.src AS node, "
            f"CAST(sum(CAST(floor(a.auth * {float(_QUANT)}) AS BIGINT)) "
            f"AS BIGINT) AS hraw "
            f"FROM edges e JOIN auth{i + 1} a ON e.dst = a.node "
            f"GROUP BY e.src)"
        )
        steps.append(
            f"hub{i + 1} AS MATERIALIZED (SELECT node, "
            f"hraw / (SELECT max(hraw) FROM hraw{i + 1}) AS hub "
            f"FROM hraw{i + 1})"
        )
    return "WITH " + ",\n".join(steps)
