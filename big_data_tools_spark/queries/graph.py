"""Graph analytics over warehouse-derived edge lists: PageRank on the
part co-purchase graph. Completes the iterative-algorithm family
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
from ..operators.pagerank import pagerank, pagerank_iteration_sql, transition_edges
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
    lineitem = load_table(spark, sf_dir, "lineitem")
    baskets = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges0 = pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"), "w"
    ).unionByName(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), "w"))
    edges = transition_edges(edges0).repartition("src").persist()
    ranks = pagerank(edges, _PR_ITERS)
    out = (
        ranks.select(F.col("node").alias("l_partkey"), "rank")
        .orderBy(F.desc("rank"), F.asc("l_partkey"))
        .limit(_PR_TOPK)
    )
    return track_cache(out, edges)
