"""Property-based tests (hypothesis) for the round-5 graph and eval
operators whose correctness reduces to a pure-Python reference model:
k-core peeling (synchronous peel on random graphs), Adamic-Adar
scoring (brute-force common-neighbor sums), and the score-grain
rank-sum AUC (naive average-rank Mann-Whitney)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

edges_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).map(
        lambda t: (min(t), max(t))
    ),
    min_size=1,
    max_size=25,
).map(lambda es: sorted({(a, b) for a, b in es if a != b}))


def _python_kcore_trace(edges, k, rounds):
    """Reference synchronous peel mirroring operators/kcore.py."""
    cur = set(edges)
    prev_nodes = {n for e in cur for n in e}
    trace = []
    for i in range(1, rounds + 1):
        deg: dict[int, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        surv = {n for n, d in deg.items() if d >= k}
        cur = {(a, b) for a, b in cur if a in surv and b in surv}
        trace.append((i, len(surv), len(cur), len(prev_nodes) - len(surv)))
        prev_nodes = surv
    return trace


@settings(max_examples=15, deadline=None)
@given(edges_strategy, st.integers(1, 3))
def test_kcore_trace_matches_python_model(spark, edges, k):
    if not edges:
        return
    from big_data_tools_spark.operators.kcore import kcore_peel_trace

    und = spark.createDataFrame(edges, "a int, b int")
    got = sorted(tuple(r) for r in kcore_peel_trace(und, k=k, rounds=4).collect())
    assert got == _python_kcore_trace(edges, k, 4)


def _python_adamic_adar(edges):
    """Brute-force AA over non-adjacent pairs with common neighbors,
    mirroring the quantization in queries/graph.py."""
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    il = {
        n: round(1.0 / round(math.log(len(ns)), 6), 6)
        for n, ns in nbrs.items()
        if len(ns) >= 2
    }
    out = {}
    nodes = sorted(nbrs)
    existing = set(edges)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) in existing:
                continue
            common = [z for z in nbrs[x] & nbrs[y] if z in il]
            if common:
                out[(x, y)] = (round(sum(il[z] for z in common), 6), len(common))
    return out


@settings(max_examples=15, deadline=None)
@given(edges_strategy)
def test_adamic_adar_matches_python_model(spark, edges):
    if not edges:
        return
    und = spark.createDataFrame(edges, "a int, b int")
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    il = deg.filter(F.col("d") >= 2).select(
        "node",
        F.round(1.0 / F.round(F.log(F.col("d").cast("double")), 6), 6).alias("w"),
    )
    x = adj.select("node", F.col("nbr").alias("pa"))
    y = adj.select("node", F.col("nbr").alias("pb"))
    wedges = (
        x.join(y, "node").filter(F.col("pa") < F.col("pb")).join(il, "node")
        .select("pa", "pb", "w")
    )
    cand = (
        wedges.join(und, (wedges.pa == und.a) & (wedges.pb == und.b), "left_anti")
        .groupBy("pa", "pb")
        .agg(
            F.round(F.sum(F.col("w").cast("decimal(28,8)")).cast("double"), 6)
            .alias("aa_score"),
            F.count(F.lit(1)).alias("n_common"),
        )
    )
    got = {
        (r["pa"], r["pb"]): (r["aa_score"], r["n_common"]) for r in cand.collect()
    }
    want = _python_adamic_adar(edges)
    assert set(got) == set(want)
    for pair in want:
        assert got[pair][1] == want[pair][1]
        assert abs(got[pair][0] - want[pair][0]) < 1e-6


scores_strategy = st.lists(
    st.tuples(
        st.integers(0, 5).map(lambda v: round(v / 5.0, 4)),  # quantized score
        st.booleans(),                                        # label
    ),
    min_size=2,
    max_size=60,
).filter(lambda rows: any(p for _, p in rows) and any(not p for _, p in rows))


def _python_auc(rows):
    """Naive average-rank Mann-Whitney over (score, is_pos) rows."""
    ordered = sorted(rows, key=lambda t: t[0])
    ranks, i = {}, 0
    while i < len(ordered):
        j = i
        while j < len(ordered) and ordered[j][0] == ordered[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for t in range(i, j):
            ranks[t] = avg
        i = j
    pos = [ranks[t] for t, (_, p) in enumerate(ordered) if p]
    n_pos, n_neg = len(pos), len(ordered) - len(pos)
    u = sum(pos) - n_pos * (n_pos + 1) / 2.0
    return n_pos, n_neg, round(u / (n_pos * n_neg), 6)


@settings(max_examples=15, deadline=None)
@given(scores_strategy)
def test_score_grain_auc_matches_naive_rank_sum(spark, rows):
    df = spark.createDataFrame(rows, "q double, is_pos boolean")
    from pyspark.sql.window import Window

    grain = df.groupBy("q").agg(
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).alias("pos_c"),
        F.sum(F.when(F.col("is_pos"), 0).otherwise(1)).alias("neg_c"),
    )
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    cum = grain.select(
        "pos_c",
        "neg_c",
        F.coalesce(F.sum("neg_c").over(w), F.lit(0)).alias("neg_below"),
    )
    got = cum.agg(
        F.sum("pos_c").cast("bigint").alias("n_pos"),
        F.sum("neg_c").cast("bigint").alias("n_neg"),
        F.round(
            F.sum(
                2 * F.col("pos_c") * F.col("neg_below")
                + F.col("pos_c") * F.col("neg_c")
            ).cast("double")
            / (2.0 * F.sum("pos_c") * F.sum("neg_c")),
            6,
        ).alias("auc"),
    ).collect()[0]
    n_pos, n_neg, auc = _python_auc(rows)
    assert (got["n_pos"], got["n_neg"]) == (n_pos, n_neg)
    assert abs(got["auc"] - auc) < 1e-6
