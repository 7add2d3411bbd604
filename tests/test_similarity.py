"""Similarity-search cross-checks: the LSH path must recall the
brute-force oracle's neighbors."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    l2_norm,
    lsh_ann_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_oracle):
    return load_table(spark, sf_oracle, "embeddings")


def test_cosine_expression_sanity(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [0.0, 1.0]), (3, [1.0, 1.0], [2.0, 2.0])],
        "id int, a array<double>, b array<double>",
    )
    rows = {r["id"]: r for r in df.select("id", cosine(F.col("a"), F.col("b")).alias("c"),
                                          l2_norm(F.col("a")).alias("n")).collect()}
    assert rows[1]["c"] == pytest.approx(1.0)
    assert rows[2]["c"] == pytest.approx(0.0)
    assert rows[3]["c"] == pytest.approx(1.0)
    assert rows[3]["n"] == pytest.approx(2 ** 0.5)


def test_lsh_recalls_brute_force_l2_neighbors(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    # brute-force L2 ground truth (same metric as the LSH variant)
    brute = brute_force_topk(emb, queries, k=5)
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    ann = lsh_ann_topk(emb, queries, k=5, num_hash_tables=8, bucket_length=4.0)
    got = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    # cosine-topk vs L2-topk differ; compare against L2-brute instead:
    recall_any = len(got & truth) / len(truth)
    # LSH with generous tables/buckets should recover a solid fraction
    assert recall_any >= 0.5, f"ANN overlap with brute cosine top-5 = {recall_any:.2f}"


def test_brute_force_excludes_self_and_ranks_deterministically(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(emb, queries, k=3).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in out)
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append((r["rn"], r["cos_sim"]))
    for q, rows in per_q.items():
        rows.sort()
        sims = [s for _, s in rows]
        assert sims == sorted(sims, reverse=True), f"rank order broken for {q}"
        assert len(rows) == 3


def test_ivf_recalls_brute_force_cosine_neighbors(emb):
    from big_data_tools_spark.operators.similarity import ivf_topk

    queries = emb.filter(F.col("vec_id") < 10)
    brute = brute_force_topk(emb, queries, k=5)
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    ivf = ivf_topk(emb, queries, k=5, n_clusters=16, n_probe=4)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"IVF recall vs brute cosine top-5 = {recall:.2f}"
    # same metric as brute: scores of overlapping pairs must be identical
    bs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in brute.collect()}
    ivs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in ivf.collect()}
    for pair in got & truth:
        assert bs[pair] == ivs[pair]


def test_ivf_index_fit_once_search_many(emb):
    import time

    from big_data_tools_spark.operators.similarity import IvfIndex, ivf_topk

    q1 = emb.filter(F.col("vec_id") < 5)
    q2 = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))
    idx = IvfIndex.fit(emb)
    try:
        r1 = {(r["query_id"], r["neighbor_id"]) for r in idx.search(q1).collect()}
        t0 = time.perf_counter()
        r2 = {(r["query_id"], r["neighbor_id"]) for r in idx.search(q2).collect()}
        reused = time.perf_counter() - t0
        # identical results to the one-shot form (same seed, same plan)
        one_shot = {
            (r["query_id"], r["neighbor_id"]) for r in ivf_topk(emb, q1).collect()
        }
        assert r1 == one_shot
        assert r1 and r2 and not (r1 & r2)  # disjoint query sets
        # reused search skips the KMeans fit: comfortably under a fresh
        # fit+search (sanity bound, not a microbenchmark)
        t0 = time.perf_counter()
        ivf_topk(emb, q2).count()
        fresh = time.perf_counter() - t0
        assert reused < fresh
    finally:
        idx.unpersist()


def test_int8_quantization_bounds_and_zero_vector(spark):
    from pyspark.sql import functions as F

    from big_data_tools_spark.operators.similarity import with_int8_quantization

    rows = [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [3.0, 3.0, 3.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: (r["q_vec"], r["q_scale"])
        for r in with_int8_quantization(df).collect()
    }
    assert out[1][0] == [64, -127, 32]  # 0.5/(1/127)=63.5 -> HALF_UP 64
    assert out[2] == ([0, 0, 0], 0.0)
    assert out[3][0] == [127, 127, 127]
    assert all(-127 <= q <= 127 for qs, _ in out.values() for q in qs)


def test_quantized_topk_recall_vs_exact(spark, sf_oracle):
    from pyspark.sql import functions as F

    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.similarity import (
        brute_force_topk,
        quantized_topk,
    )

    emb = load_table(spark, sf_oracle, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    quant = quantized_topk(emb, queries, k=5).collect()
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    q = {(r["query_id"], r["neighbor_id"]) for r in quant}
    recall = len(e & q) / len(e)
    assert recall >= 0.9, f"int8 recall {recall:.2f}"


def test_ivf_index_save_load_roundtrip(spark, tmp_path):
    """fit -> save -> load must search identically to the in-memory
    index (the fit-once/search-many contract surviving a session
    boundary)."""
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.similarity import IvfIndex

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    idx = IvfIndex.fit(emb, n_clusters=8)
    want = sorted(map(tuple, idx.search(queries, k=5, n_probe=3).collect()))

    path = str(tmp_path / "ivf_index")
    idx.save(path)
    idx.unpersist()

    loaded = IvfIndex.load(spark, path)
    got = sorted(map(tuple, loaded.search(queries, k=5, n_probe=3).collect()))
    loaded.unpersist()
    assert got == want


def test_ann_recall_report_surface(spark, sf_oracle):
    """The registered recall-report surface must carry both tiers with
    sane floors (same 0.5 floor as the direct recall tests) and a
    full 10-query evaluation set."""
    from big_data_tools_spark.queries import get

    rows = {
        r["tier"]: r.asDict()
        for r in get("ann_recall_report").fn(spark, sf_oracle).collect()
    }
    assert set(rows) == {"lsh", "ivf"}
    for tier, r in rows.items():
        assert r["n_queries"] == 10
        assert r["mean_recall_at_5"] >= 0.5, (tier, r)
        assert 0.0 <= r["min_recall_at_5"] <= r["mean_recall_at_5"] <= 1.0


def test_hubness_ann_agrees_with_exact_audit(spark):
    """The ANN hubness tier must see the same hub structure as the
    exact all-pairs audit at sf0.01: same vector total, an anti-hub
    (k_occ = 0) bucket within 10 points of the exact one, and a
    heavy-tail max k_occ within 2x — the agreement contract that lets
    the ANN tier stand in for the O(n^2) audit at scale."""
    from big_data_tools_spark.operators.cache import release_all_caches, release_caches
    from big_data_tools_spark.queries import all_queries

    reg = all_queries()
    sf = "/root/testdata/sf0.01"
    exact = {r["k_occ"]: r["n_vectors"]
             for r in reg["embedding_hubness_audit"].fn(spark, sf).collect()}
    ann_df = reg["embedding_hubness_audit_ann"].fn(spark, sf)
    ann = {r["k_occ"]: r["n_vectors"] for r in ann_df.collect()}
    release_caches(ann_df)
    release_all_caches()

    n_exact, n_ann = sum(exact.values()), sum(ann.values())
    assert n_exact == n_ann  # every vector lands in exactly one bucket
    # anti-hub bucket: vectors nobody lists. The ANN tier sees fewer
    # candidates per query, so its anti-hub count can only drift up a
    # bounded amount, never down past the exact audit's.
    anti_exact, anti_ann = exact.get(0, 0), ann.get(0, 0)
    assert abs(anti_ann - anti_exact) <= 0.10 * n_exact, (anti_exact, anti_ann)
    # heavy tail: the biggest hub's in-degree survives candidate pruning
    assert max(ann) >= max(exact) / 2, (max(exact), max(ann))
    # each query still fills its full top-k through 4-of-16 probes here
    k_mass_exact = sum(k * n for k, n in exact.items())
    k_mass_ann = sum(k * n for k, n in ann.items())
    assert k_mass_ann >= 0.9 * k_mass_exact, (k_mass_exact, k_mass_ann)


def test_ivf_search_salted_equals_broadcast_under_hub_skew(spark):
    """The r11 skew fix: large query batches take the SALTED scoring
    join (shard-exploded routed side x pmod-sharded inverted lists)
    instead of shuffling on the bare cluster-id key. On a hub-skewed
    corpus — most vectors co-clustered onto one centroid — the salted
    plan must return exactly the broadcast plan's rows."""
    from big_data_tools_spark.operators.similarity import IvfIndex

    # hand-built index: 300 of 340 vectors pinned to ONE inverted list
    # (a KMeans fit rebalances synthetic blobs, so the hub is
    # constructed, not fitted — the paths under test are the joins)
    rows = []
    for i in range(300):
        rows.append((i, [1.0, 0.001 * (i % 17), 0.002 * (i % 7)], 0))
    for i in range(300, 340):
        j = i - 300
        rows.append((i, [0.1 * (j % 5), 1.0 + 0.01 * j, 0.3 * (j % 3)],
                     1 + j % 5))
    assigned = spark.createDataFrame(
        rows, "neighbor_id long, c_vec array<double>, cluster_id int"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.01, 0.01])]
        + [(c, [0.2 * c, 1.0, 0.3]) for c in range(1, 6)],
        "cluster_id int, centroid array<double>",
    )
    emb = assigned.select(
        F.col("neighbor_id").alias("vec_id"),
        F.col("c_vec").alias("embedding"),
    )
    idx = IvfIndex(assigned, F.broadcast(cents), "vec_id", "embedding")
    try:
        sizes = [
            r["n"]
            for r in idx._assigned.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        assert max(sizes) >= 3 * (sum(sizes) / len(sizes)), sizes  # real skew

        def key(df):
            return {
                (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rn"])
                for r in df.collect()
            }

        salted = idx.search(emb, k=3, broadcast_max_queries=None, n_shards=4)
        assert "__shard" not in salted.columns
        bcast = idx.search(emb, k=3, broadcast_max_queries=10_000)
        assert key(salted) == key(bcast)
        # n_shards=1 degenerates to the plain equi-join, same rows
        plain = idx.search(emb, k=3, broadcast_max_queries=0, n_shards=1)
        assert key(plain) == key(bcast)
    finally:
        idx.unpersist()
