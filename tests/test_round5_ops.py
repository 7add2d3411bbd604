"""Round-5 additions: k-core peeling, CUSUM changepoints, bigram
stupid-backoff scoring, Zipf fit — fixture dynamics pinned by hand,
plus Python replications of the sequential recurrences (the
registry-level DuckDB twins are exercised by test_oracle_parity)."""

from __future__ import annotations

import duckdb

from big_data_tools_spark.operators.kcore import kcore_peel_trace, kcore_trace_sql
from big_data_tools_spark.queries import get

# path 1-2-3-4-5 plus triangle 6-7-8: the 2-core is exactly the
# triangle, reached after three peel rounds (endpoints, then the
# stranded path middles, then the isolated node 3)
_PLANT_EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (6, 8), (7, 8)]
_PLANT_TRACE = [
    (1, 6, 5, 2),  # endpoints 1 and 5 peel
    (2, 4, 3, 2),  # path middles 2 and 4 peel, stranding 3
    (3, 3, 3, 1),  # 3 is edgeless -> degree 0 -> peels
    (4, 3, 3, 0),  # fixpoint: the triangle IS the 2-core
    (5, 3, 3, 0),
]


def test_kcore_planted_graph(spark):
    und = spark.createDataFrame(_PLANT_EDGES, "a int, b int")
    got = sorted(
        tuple(r) for r in kcore_peel_trace(und, k=2, rounds=5).collect()
    )
    assert got == _PLANT_TRACE


def test_kcore_sql_twin_matches_planted_graph():
    values = ", ".join(f"({a}, {b})" for a, b in _PLANT_EDGES)
    cte = f"und AS (SELECT * FROM (VALUES {values}) t(a, b))"
    rows = duckdb.sql(
        kcore_trace_sql(cte, k=2, rounds=5) + "SELECT * FROM trace ORDER BY round"
    ).fetchall()
    assert [tuple(r) for r in rows] == _PLANT_TRACE


def test_kcore_validates_args(spark):
    und = spark.createDataFrame(_PLANT_EDGES, "a int, b int")
    for bad in ({"k": 0}, {"rounds": 0}):
        try:
            kcore_peel_trace(und, **{"k": 2, "rounds": 3, **bad})
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


def test_cusum_matches_python_replication(spark, sf_smoke):
    from big_data_tools_spark.queries.timeseries import _CUSUM_H, _CUSUM_K

    daily = duckdb.sql(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS y
        FROM '{sf_smoke}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    ys = [y for _, y in daily]
    n = len(ys)
    mean = sum(ys) / n  # replication only; query uses exact decimal sums
    var = (sum(v * v for v in ys) - n * mean * mean) / (n - 1)
    std = var ** 0.5
    sp = sn = 0.0
    want = {}
    for day, y in daily:
        z = round((y - mean) / std, 6)
        sp = round(max(0.0, sp + z - _CUSUM_K), 6)
        sn = round(max(0.0, sn - z - _CUSUM_K), 6)
        want[day] = (z, sp, sn, 1 if sp > _CUSUM_H or sn > _CUSUM_H else 0)
    rows = get("daily_revenue_cusum").fn(spark, sf_smoke).collect()
    assert len(rows) == n
    for r in rows:
        z, sp, sn, alarm = want[r["day"]]
        assert abs(r["zscore"] - z) < 1e-4, r
        assert abs(r["cusum_pos"] - sp) < 1e-3, r
        assert abs(r["cusum_neg"] - sn) < 1e-3, r


def test_bigram_backoff_properties(spark, sf_smoke):
    rows = {r["lang"]: r for r in get("doc_bigram_backoff_nll").fn(spark, sf_smoke).collect()}
    assert set(rows) == {"en", "de", "fr", "es", "zh"}
    for r in rows.values():
        assert r["n_docs"] > 0 and r["n_bigrams"] > r["n_docs"]
        assert 0.0 <= r["backoff_rate"] < 1.0
        assert r["avg_nll"] > 0.0
    # the held-out split must actually hold documents out: scored docs
    # are a strict subset of the corpus
    n_docs_total = spark.read.parquet(f"{sf_smoke}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows.values()) < n_docs_total


def test_zipf_fit_properties(spark, sf_smoke):
    # r9: micro-unit integer outputs (1e6 * value) — no doubles
    row = get("corpus_zipf_fit").fn(spark, sf_smoke).collect()[0]
    assert row["n_points"] >= 10
    assert row["zipf_slope_micro"] < 0  # frequency decreases with rank
    assert 0 <= row["r2_micro"] <= 1_000_000
    # the synthetic corpus draws words near-uniformly, so the fit must
    # NOT look Zipfian — exactly the diagnostic the query exists for
    assert row["zipf_slope_micro"] > -500_000


def test_adamic_adar_planted_graph(spark):
    """Star a-{b,c,d} plus edge b-c: the only non-adjacent pairs with
    common neighbors are (b,d) and (c,d) via hub a (deg 3), and (a is
    adjacent to everything). b-c are adjacent so they are excluded
    even though they share neighbor a."""
    import math

    from big_data_tools_spark.queries.graph import copurchase_adamic_adar  # noqa: F401 (registry import)

    # drive the operator core directly on a planted edge frame
    from big_data_tools_spark.queries import graph as G
    from pyspark.sql import functions as F

    und = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "a int, b int"
    )
    # replicate the registered query's pipeline from the und frame
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
    got = {(r["pa"], r["pb"]): (r["aa_score"], r["n_common"]) for r in cand.collect()}
    inv_ln3 = round(1.0 / round(math.log(3), 6), 6)
    assert set(got) == {(2, 4), (3, 4)}
    for pair in got:
        score, n_common = got[pair]
        assert n_common == 1
        assert abs(score - inv_ln3) < 1e-9


def test_assortativity_star_is_negative(spark, sf_smoke):
    """A pure star is maximally disassortative; the registered query
    on real data must emit a finite coefficient in [-1, 1]."""
    row = get("copurchase_assortativity").fn(spark, sf_smoke).collect()[0]
    assert row["n_edge_ends"] > 0
    assert -1.0 <= row["assortativity"] <= 1.0


def test_entropy_rate_bounds(spark, sf_smoke):
    import math

    rows = get("event_entropy_rate").fn(spark, sf_smoke).collect()
    assert rows
    n_states = len(rows)
    rates = {r["entropy_rate_bits"] for r in rows}
    assert len(rates) == 1  # the chain-level rate is a constant column
    rate = rates.pop()
    for r in rows:
        assert 0.0 <= r["h_bits"] <= math.log2(n_states) + 1e-6
        assert 0.0 < r["pi"] <= 1.0
    assert 0.0 <= rate <= math.log2(n_states) + 1e-6
    # rate is the pi-weighted mean of per-state entropies
    want = sum(round(r["pi"] * r["h_bits"], 8) for r in rows)
    assert abs(rate - want) < 1e-5


def test_heaps_fit_properties(spark, sf_smoke):
    # r7 redesign: corpus_heaps_fit is now the bit-exact integer
    # growth curve; the ln-OLS fit moved to corpus_heaps_beta
    curve = get("corpus_heaps_fit").fn(spark, sf_smoke).collect()
    assert len(curve) >= 5
    by_cp = sorted(curve, key=lambda r: r["checkpoint"])
    prev_t = prev_v = 0
    for r in by_cp:
        # the curve is cumulative: tokens and vocab never shrink
        assert r["n_tokens"] >= prev_t and r["vocab"] >= prev_v
        assert r["vocab"] <= r["n_tokens"]
        prev_t, prev_v = r["n_tokens"], r["vocab"]
    row = get("corpus_heaps_beta").fn(spark, sf_smoke).collect()[0]
    assert row["n_points"] >= 5
    # natural language has beta in [0.4, 0.6]; the synthetic corpus
    # draws from a ~31-word vocabulary that saturates before the first
    # checkpoint, so the fit must diagnose NO growth — beta ~= 0 with
    # the guarded-degenerate r2 = 0 (exactly the signal the query
    # exists to surface). r9: micro-unit integers (1e6 * value).
    assert 0 <= row["heaps_beta_micro"] < 100_000
    assert 0 <= row["r2_micro"] <= 1_000_000


def test_quality_auc_matches_naive_rank_sum(spark, sf_smoke):
    """The score-grain U statistic must equal the naive average-rank
    Mann-Whitney computed in Python over the same quantized scores."""
    import duckdb

    from big_data_tools_spark.queries.text import _SW  # noqa: F401

    rows = duckdb.sql(
        f"""
        SELECT lang = 'en' AS is_pos,
               round(least(len(string_split(lower(text), ' ')) / 100.0, 1.0) * 0.4
                   + least((len(list_filter(string_split(lower(text), ' '),
                         t -> t IN ({_SW}))) * 1.0
                         / len(string_split(lower(text), ' '))) * 4, 1.0) * 0.3
                   + greatest(0.0, 1.0 - (length(regexp_replace(lower(text),
                         '[a-z0-9 ]', '', 'g')) * 1.0 / length(lower(text))) * 5)
                     * 0.3, 4) AS q
        FROM '{sf_smoke}/documents.parquet'
        """
    ).fetchall()
    scored = sorted((q, pos) for pos, q in rows)
    # average ranks with ties
    ranks, i = {}, 0
    while i < len(scored):
        j = i
        while j < len(scored) and scored[j][0] == scored[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[k] = avg
        i = j
    pos_ranks = [ranks[k] for k, (_, p) in enumerate(scored) if p]
    n_pos = len(pos_ranks)
    n_neg = len(scored) - n_pos
    u = sum(pos_ranks) - n_pos * (n_pos + 1) / 2.0
    want = round(u / (n_pos * n_neg), 6)
    row = get("doc_quality_auc").fn(spark, sf_smoke).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert abs(row["auc"] - want) < 1e-6
