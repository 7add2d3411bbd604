"""k-core decomposition by synchronous peeling (Seidman 1983, "Network
structure and minimum degree"; distributed formulation as in Montresor
et al. 2013) — the graph-density primitive next to PageRank
(centrality), triangles (cohesion), connected components
(reachability), and label propagation (community structure).

The k-core is the maximal subgraph in which every node has degree >=
k; it is what a curation pipeline uses to find the dense "hub" region
of a similarity or co-occurrence graph (e.g. boilerplate clusters in a
near-dup graph are high-core, singleton docs are 0-core). Peeling is
the textbook algorithm: repeatedly delete every node with degree < k;
the fixpoint is the k-core regardless of deletion order, and the
SYNCHRONOUS variant (delete all under-degree nodes each round) makes
every round a pure function of the edge set — reproducible across
runs, partitionings, and engines.

Scale shape: the undirected edge list ``(a, b)``, a < b, is persisted
per round; a round is one degree aggregate (hash agg with map-side
combine over 2|E| endpoint rows) and two semi-joins filtering the edge
list to surviving endpoints — 3 hash shuffles on the node key, no
driver synchronization, and the edge list only ever SHRINKS, so
round cost is monotone non-increasing. Fixed ``rounds`` compose into
one static plan; the emitted trace shows whether the peel converged
(``n_removed = 0``) so a user sizes ``rounds`` from data instead of
guessing (same telemetry contract as operators/pagerank.py
``pagerank_trace`` / operators/communities.py
``label_propagation_trace``).

All trace columns are exact integers, so the DuckDB twin
(:func:`kcore_trace_sql`, unrolled round CTEs) hash-matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _degrees(und: DataFrame) -> DataFrame:
    """(node, d) over an undirected (a, b) edge list — nodes with no
    surviving edges simply don't appear (degree 0)."""
    return (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def kcore_peel_trace(und: DataFrame, k: int, rounds: int) -> DataFrame:
    """Synchronous k-core peel over an undirected, deduplicated edge
    list ``(a, b)`` with ``a < b``. One row per round:

    - ``round``: 1-based peel round;
    - ``n_nodes``: nodes surviving the round (degree >= k against the
      round's incoming edge set);
    - ``n_edges``: edges with both endpoints surviving;
    - ``n_removed``: nodes LOST from the surviving set this round —
      previous round's ``n_nodes`` minus this round's (round 1
      baselines against the distinct endpoints of the input). This
      counts stranded nodes (survivors whose last edge vanished and
      who therefore no longer appear as endpoints) in the round they
      disappear, so 0 really means converged: the surviving subgraph
      IS the k-core and further rounds are wasted shuffles.

    Each round's shrunken edge frame is eagerly localCheckpoint-ed:
    a round references the previous round's frame THREE times (degree
    build + both membership probes), so without plan truncation the
    logical plan grows 3^rounds and Catalyst analysis stalls long
    before execution — the same reason the DuckDB twin materializes
    its round CTEs, and the same localCheckpoint-per-round treatment
    as the connected-components fixpoint (operators/components.py;
    swap for a reliable checkpoint dir on a real cluster). The
    checkpointed RDD blocks are released by the ContextCleaner once
    the per-round frames go out of scope (same lifecycle as the
    components fixpoint).

    ONLY the edge frame materializes per round (one blocking job).
    The survivor set is a plain degree-aggregate expression over the
    checkpointed edges — its three consumers (both membership probes,
    the trace's n_nodes) each recompute one cheap hash-agg over an
    in-memory frame rather than paying a second job-submission
    barrier per round, and lineage stays linear because every path
    bottoms out at a checkpoint. Measured at sf0.1 this halves the
    peel's job count (r8 bench pass)."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"need rounds >= 1, got {rounds}")
    cur = und.localCheckpoint(eager=True)
    traces = []
    prev_nodes = _degrees(cur).select("node")
    for i in range(1, rounds + 1):
        deg = _degrees(cur)
        surv = deg.filter(F.col("d") >= k).select("node")
        nxt = (
            cur.join(surv.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(surv.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_before = prev_nodes.agg(F.count(F.lit(1)).alias("nb"))
        n_nodes = surv.agg(F.count(F.lit(1)).alias("n_nodes"))
        n_edges = nxt.agg(F.count(F.lit(1)).alias("n_edges"))
        traces.append(
            n_nodes.crossJoin(n_edges)
            .crossJoin(n_before)
            .select(
                F.lit(i).cast("int").alias("round"),
                "n_nodes",
                "n_edges",
                (F.col("nb") - F.col("n_nodes")).alias("n_removed"),
            )
        )
        cur = nxt
        prev_nodes = surv
    out = traces[0]
    for t in traces[1:]:
        out = out.unionByName(t)
    return out


def kcore_trace_sql(und_cte: str, k: int, rounds: int) -> str:
    """DuckDB twin of :func:`kcore_peel_trace` over a caller-supplied
    CTE chain ending in ``und(a, b)`` (undirected, deduped, a < b):
    unrolls the synchronous peel rounds; the caller appends
    ``SELECT * FROM trace``. The per-round CTEs are ``MATERIALIZED``:
    each round references the previous round's edge set three times
    (degree build + two membership probes), so DuckDB's default
    inline-expansion would re-plan the base scan O(3^rounds) times."""
    steps = [und_cte, "e0 AS MATERIALIZED (SELECT a, b FROM und)"]
    for i in range(1, rounds + 1):
        steps.append(
            f"d{i} AS MATERIALIZED (SELECT node, count(*) AS d FROM ("
            f"SELECT a AS node FROM e{i - 1} "
            f"UNION ALL SELECT b FROM e{i - 1}) GROUP BY node)"
        )
        steps.append(f"s{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE d >= {k})")
        steps.append(
            f"e{i} AS MATERIALIZED (SELECT a, b FROM e{i - 1} "
            f"WHERE a IN (SELECT node FROM s{i}) "
            f"AND b IN (SELECT node FROM s{i}))"
        )
        # baseline for n_removed: round 1 uses the input's distinct
        # endpoints (d1), later rounds the previous surviving set —
        # so stranded zero-degree survivors count in the round they
        # disappear (they are no longer endpoints, so d_i misses them)
        prev = "d1" if i == 1 else f"s{i - 1}"
        steps.append(
            f"t{i} AS (SELECT {i} AS round, "
            f"(SELECT count(*) FROM s{i}) AS n_nodes, "
            f"(SELECT count(*) FROM e{i}) AS n_edges, "
            f"(SELECT count(*) FROM {prev}) - (SELECT count(*) FROM s{i})"
            f" AS n_removed)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM t{i}" for i in range(1, rounds + 1))
    return "WITH " + ",\n".join(steps) + f",\ntrace AS ({union})\n"
