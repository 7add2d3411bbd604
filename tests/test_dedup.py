"""Dedup tier cross-checks (SURVEY.md §2.11): the approximate tiers
must recall what the exact tier finds.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.operators.dedup import (
    jaccard_pairs,
    minhash_near_dup_pairs,
    simhash64,
    simhash_candidate_pairs,
)


@pytest.fixture(scope="module")
def docs(spark, sf_oracle):
    return load_table(spark, sf_oracle, "documents")


def test_minhash_recalls_exact_near_dups(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "text", "doc_id", threshold=0.9).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(
            docs, "text", "doc_id", max_jaccard_distance=0.3
        ).collect()
    }
    assert exact, "fixture data should contain >=0.9-jaccard near-dups"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"MinHashLSH recall {recall:.2f} over exact pairs {len(exact)}"


def test_simhash_near_dups_have_close_fingerprints(spark, docs):
    sim = simhash64(docs, "text", "doc_id")
    cands = simhash_candidate_pairs(sim, max_hamming=6)
    exact = jaccard_pairs(docs, "text", "doc_id", threshold=0.95).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    # >=0.95-jaccard docs should mostly collide within small hamming distance
    hits = exact.join(
        cands,
        (exact.doc_a == cands.id_a) & (exact.doc_b == cands.id_b),
        "inner",
    ).count()
    total = exact.count()
    assert total > 0
    assert hits / total >= 0.7, f"simhash candidate recall {hits}/{total}"


def test_simhash_is_deterministic(docs):
    a = {(r["doc"], r["simhash"]) for r in simhash64(docs, "text", "doc_id").collect()}
    b = {(r["doc"], r["simhash"]) for r in simhash64(docs, "text", "doc_id").collect()}
    assert a == b
    assert all(len(h) == 16 for _, h in a)


def test_embedding_cosine_pairs_exact_and_symmetric(spark):
    from big_data_tools_spark.operators.dedup import embedding_cosine_pairs

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.001, 0.0]),   # ~1.0 cosine with 1
            (3, [0.0, 1.0, 0.0]),     # orthogonal
            (4, [2.0, 0.0, 0.0]),     # colinear with 1 (scale-invariant)
        ],
        "vec_id long, embedding array<float>",
    )
    out = embedding_cosine_pairs(df, threshold=0.95)
    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in out.collect()}
    assert (1, 2) in pairs and (1, 4) in pairs and (2, 4) in pairs
    assert all(a < b for a, b in pairs)          # canonical orientation
    assert pairs[(1, 4)] == 1.0                  # exact colinear
    assert not any(3 in p for p in pairs)        # orthogonal excluded


def test_minhash_band_pairs_recalls_exact_jaccard(docs):
    from big_data_tools_spark.operators.dedup import minhash_band_pairs

    exact = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 2))
        for r in jaccard_pairs(docs, "text", "doc_id", threshold=0.7).collect()
    }
    banded = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 2))
        for r in minhash_band_pairs(docs, "text", "doc_id", threshold=0.7).collect()
    }
    ids_exact = {(a, b) for a, b, _ in exact}
    ids_banded = {(a, b) for a, b, _ in banded}
    recall = len(ids_banded & ids_exact) / max(1, len(ids_exact))
    assert recall >= 0.9, f"banded recall vs exact jaccard = {recall:.2f}"
    # jaccard values agree where the pair overlaps (same metric, both
    # computed over hashed distinct shingles modulo the df cap)
    both = {p: j for a, b, j in banded if (p := (a, b)) in ids_exact}
    exact_vals = {(a, b): j for a, b, j in exact}
    close = sum(1 for p, j in both.items() if abs(j - exact_vals[p]) <= 0.05)
    assert close / max(1, len(both)) >= 0.9


def test_connected_components_transitive_closure(spark):
    from big_data_tools_spark.operators.components import connected_components

    # chain 1-2-3, pair 10-11, triangle 20-21-22 (+cross edge)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == 20
    assert len(comp) == 8


def test_connected_components_self_pairs_are_singletons(spark):
    """r10 ADVICE: self-pairs carry no connectivity but the node must
    still get a row — a singleton component — so 'every node appearing
    in pairs' holds. Node 2 has BOTH a self-pair and a real edge: the
    real component wins, no duplicate row."""
    from big_data_tools_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (3, 3), (2, 1), (4, 4), (2, 2)], "id_a long, id_b long"
    )
    out = [
        (r["node"], r["component_id"])
        for r in connected_components(pairs).collect()
    ]
    assert sorted(out) == [(1, 1), (2, 1), (3, 3), (4, 4)]


def test_connected_components_self_loops_false_on_strict_pairs(spark):
    """r11: callers whose pair stream is strict (src < dst everywhere —
    every dedup tier here) pass self_loops=False to skip the singleton
    probe, which otherwise re-executes the whole upstream pair pipeline
    a second time. On strict pairs the output must be IDENTICAL, on
    both the fast and the distributed path."""
    from big_data_tools_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    for kw in ({}, {"small_graph_max_edges": None}):
        with_probe = {
            (r["node"], r["component_id"])
            for r in connected_components(pairs, **kw).collect()
        }
        without = {
            (r["node"], r["component_id"])
            for r in connected_components(
                pairs, self_loops=False, **kw
            ).collect()
        }
        assert with_probe == without


def test_connected_components_fast_path_equals_distributed(spark):
    """r11 small-graph fast path: driver union-find below the edge
    threshold must return exactly the distributed star-contraction
    rows (including self-pair singletons)."""
    from big_data_tools_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22), (7, 7)],
        "id_a long, id_b long",
    )
    fast = {
        (r["node"], r["component_id"])
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r["node"], r["component_id"])
        for r in connected_components(
            pairs, small_graph_max_edges=None
        ).collect()
    }
    assert fast == dist
    assert (7, 7) in fast  # self-pair singleton survives both paths


def test_connected_components_star_contraction_properties(spark):
    """The r10 large-star/small-star upgrade: round count is
    O(log^2 n), not O(diameter) — a 200-link chain (the min-label
    worst case, 200 rounds) must converge in <= 12 — and the optional
    trace exposes per-round (n_nodes, n_edges) like kcore_peel's."""
    from big_data_tools_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 201)], "id_a long, id_b long"
    )
    trace = []
    comp = {
        r["node"]: r["component_id"]
        for r in connected_components(chain, trace=trace).collect()
    }
    assert len(comp) == 201 and set(comp.values()) == {1}
    assert 1 <= len(trace) <= 12, trace
    assert all(set(t) == {"round", "n_nodes", "n_edges"} for t in trace)
    # contraction: the star-forest fixpoint has exactly one edge per
    # non-root node, and every node survives to the final round
    assert trace[-1]["n_edges"] == 200
    assert trace[-1]["n_nodes"] == 201

    # duplicate + reversed edges collapse to the same components
    dup = spark.createDataFrame(
        [(5, 3), (3, 5), (3, 1), (8, 9), (9, 8)], "id_a long, id_b long"
    )
    comp2 = {
        r["node"]: r["component_id"] for r in connected_components(dup).collect()
    }
    assert comp2 == {5: 1, 3: 1, 1: 1, 8: 8, 9: 8}


def test_winnow_guarantee_shared_run_surfaces_fingerprint(spark):
    """Winnowing guarantee (Schleimer et al. SIGMOD 2003 §3): any shared
    normalized substring of length >= K + W - 1 yields at least one
    shared fingerprint between the two documents."""
    from big_data_tools_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        with_winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog"
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    rows = [
        (1, f"alpha beta gamma {shared} delta epsilon"),
        (2, f"zeta eta {shared} theta iota kappa lambda"),
        (3, "completely different content with no overlap at all here xyz"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = with_winnow_fingerprints(df, "text", "fps")
    by_id = {r["doc_id"]: set(r["fps"]) for r in out.collect()}
    assert by_id[1] & by_id[2], "docs sharing a long run must share a fingerprint"
    # the disjoint doc should not share with either (different 8-grams)
    assert not (by_id[1] & by_id[3])


def test_winnow_short_doc_yields_empty_set(spark):
    from big_data_tools_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        with_winnow_fingerprints,
    )

    short = "x" * (WINNOW_K + WINNOW_W - 2)  # one char below the floor
    df = spark.createDataFrame([(1, short), (2, "")], ["doc_id", "text"])
    out = {r["doc_id"]: r["fps"] for r in with_winnow_fingerprints(df, "text").collect()}
    assert out[1] == [] and out[2] == []


def test_winnow_pairs_plan_has_no_inlined_generate_filter(spark, sf_oracle):
    """Regression: plain explode over the fingerprint array triggers
    InferFiltersFromGenerate, whose size() filter gets predicate-pushed
    below the fingerprint projections with the whole expression inlined
    — re-evaluating the hash array inside every per-element lambda
    (O(n^3) per row; a multi-minute hang on 500 docs). winnow_pairs uses
    explode_outer + isNotNull on the generated attribute instead; no
    Filter in the optimized plan may contain the k-gram aggregate."""
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.dedup import winnow_pairs

    docs = load_table(spark, sf_oracle, "documents")
    out = winnow_pairs(docs, "text", "doc_id")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if line.lstrip().startswith(("Filter", "+- Filter", ":- Filter")):
            assert "aggregate(" not in line, (
                "fingerprint expression inlined into a pushed-down filter:\n" + line
            )


def test_semantic_dedup_pairs_subset_of_exact_and_deterministic(spark, sf_oracle):
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.dedup import embedding_cosine_pairs
    from big_data_tools_spark.operators.semdedup import semantic_dedup_pairs

    emb = load_table(spark, sf_oracle, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.45).collect()
    }
    sem = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.45, n_clusters=8
        ).collect()
    }
    # candidates are scored with the same exact cosine, so semdedup can
    # only MISS cross-cluster pairs, never invent one
    assert sem <= exact
    assert len(sem) > 0
    # seeded fit + exact scoring -> identical output on rerun
    sem2 = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.45, n_clusters=8
        ).collect()
    }
    assert sem == sem2


def test_semantic_dedup_sample_fit_subset_and_recall(spark, sf_oracle):
    """A forcing ``fit_sample_cap`` (200 of 500 vectors see the Lloyd
    iterations) must keep the subset-of-exact invariant — candidates
    are still scored with exact cosine — and recall about as many
    pairs as the FULL-corpus fit at the same parameters (the 0.45
    test threshold sits far below near-duplicate similarity, so some
    cluster-straddling loss is inherent to SemDeDup itself; the claim
    under test is that sampling the fit doesn't make it worse)."""
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.dedup import embedding_cosine_pairs
    from big_data_tools_spark.operators.semdedup import semantic_dedup_pairs

    emb = load_table(spark, sf_oracle, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.45).collect()
    }
    full_fit = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.45, n_clusters=8,
            fit_sample_cap=None,
        ).collect()
    }
    sampled = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.45, n_clusters=8,
            fit_sample_cap=200,
        ).collect()
    }
    assert sampled <= exact
    assert len(sampled) >= 0.7 * len(full_fit)
    # deterministic: md5-membership sample + seeded fit -> same output
    sampled2 = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.45, n_clusters=8,
            fit_sample_cap=200,
        ).collect()
    }
    assert sampled == sampled2


def test_semantic_dedup_cluster_size_guard_trips(spark, sf_oracle):
    import pytest

    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.semdedup import semantic_dedup_pairs

    emb = load_table(spark, sf_oracle, "embeddings")
    with pytest.raises(ValueError, match="max_cluster_size"):
        semantic_dedup_pairs(
            emb, "vec_id", "embedding", n_clusters=2, max_cluster_size=10
        )


def test_portable_minhash_matches_exact_jaccard(docs):
    """The md5-family portable variant confirms with exact Jaccard, so
    its pairs must be a subset of the exact >=0.8 pairs with equal
    scores, and the 16/8 banding must recall nearly all of them."""
    from big_data_tools_spark.operators.dedup import minhash_band_pairs_portable

    exact = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in jaccard_pairs(docs, "text", "doc_id", threshold=0.8).collect()
    }
    portable = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_band_pairs_portable(
            docs, "text", "doc_id", threshold=0.8
        ).collect()
    }
    assert exact, "fixture data should contain >=0.8-jaccard near-dups"
    assert set(portable) <= set(exact)
    for pair, j in portable.items():
        assert j == exact[pair]
    recall = len(portable) / len(exact)
    assert recall >= 0.9, f"portable banding recall {recall:.2f}"


def test_portable_simhash_high_precision(docs, spark):
    """hamming<=3 on the 64-bit portable SimHash is a high-PRECISION
    near-dup signal: every flagged pair must be >=0.9 exact Jaccard
    (measured: all pairs at sf0.01 are >=0.95). Recall of borderline
    0.9-jaccard pairs is NOT asserted — 64-bit simhash at hamming 3
    targets the ~0.97+ band (Manku et al.'s regime); the minhash tiers
    cover the looser band."""
    from big_data_tools_spark.operators.dedup import simhash_band_pairs_portable

    flagged = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_band_pairs_portable(docs, "text", "doc_id").collect()
    }
    assert flagged, "fixture data should contain simhash near-dups"
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, "text", "doc_id", threshold=0.9).collect()
    }
    missing = [p for p in flagged if p not in exact]
    assert not missing, f"hamming<=3 pairs below 0.9 jaccard: {missing}"


def test_portable_simhash_identical_docs_hamming_zero(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words entirely here now")],
        "doc_id long, text string",
    )
    from big_data_tools_spark.operators.dedup import simhash_band_pairs_portable

    rows = simhash_band_pairs_portable(df, "text", "doc_id").collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in rows] == [(1, 2, 0)]


def test_lsh_banding_plan_math():
    """b x r == num_hashes, the false-negative target is honored when
    feasible (maximizing r), the S-curve is monotone, and the
    fallback picks the lowest-FN split when the target is infeasible."""
    from big_data_tools_spark.operators.dedup import lsh_banding_plan

    p = lsh_banding_plan(0.7, num_hashes=48, target_fn_rate=0.05)
    assert p["bands"] * p["rows"] == 48
    assert p["fn_rate_at_threshold"] <= 0.05
    probs = list(p["curve"].values())
    assert probs == sorted(probs)
    # steeper than the repo's 16x3 default at the same threshold:
    # (1 - 0.7^3)^16 ~ 0.0014 FN but a shallower curve; the plan
    # prefers 12x4 (more confirm-work saved below threshold)
    assert p["rows"] >= 3

    # infeasible target: 4 hashes cannot reach 1e-6 FN at 0.9 --
    # falls back to the split with the LOWEST fn rate
    q = lsh_banding_plan(0.9, num_hashes=4, target_fn_rate=1e-6)
    assert q["bands"] * q["rows"] == 4
    best = min(
        ((4 // r, r) for r in (1, 2, 4)),
        key=lambda br: (1 - 0.9 ** br[1]) ** br[0],
    )
    assert (q["bands"], q["rows"]) == best


def test_dedup_tier_quality_report(spark, sf_oracle):
    """The measured tier report: minhash confirms candidates with
    exact Jaccard so its precision is 1.0 and recall near-total; all
    metrics stay in range; tiers with different similarity notions
    (winnow coverage, simhash hamming) still report consistent
    counts."""
    from big_data_tools_spark.queries import get

    rows = {r["tier"]: r for r in get("dedup_tier_quality_report").fn(spark, sf_oracle).collect()}
    assert set(rows) == {"minhash", "winnow", "simhash"}
    for r in rows.values():
        assert 0 <= r["precision"] <= 1 and 0 <= r["recall"] <= 1
        assert r["tp"] <= r["n_pairs"]
    mh = rows["minhash"]
    assert mh["precision"] == 1.0
    assert mh["recall"] >= 0.9


def test_lsh_banding_plan_properties_random_sweep():
    """Hypothesis-style sweep without Spark: over a grid of thresholds
    and signature widths, the chosen split always factorizes, honors
    the FN target when ANY split can, and the curve is monotone."""
    from big_data_tools_spark.operators.dedup import lsh_banding_plan

    for num_hashes in (16, 48, 64, 120):
        for t in (0.3, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95):
            p = lsh_banding_plan(t, num_hashes=num_hashes, target_fn_rate=0.05)
            assert p["bands"] * p["rows"] == num_hashes
            feasible = any(
                (1 - t**r) ** (num_hashes // r) <= 0.05
                for r in range(1, num_hashes + 1)
                if num_hashes % r == 0
            )
            if feasible:
                assert p["fn_rate_at_threshold"] <= 0.05, (num_hashes, t, p)
            probs = list(p["curve"].values())
            assert probs == sorted(probs)


def test_semantic_dedup_from_loaded_index_matches_one_shot(spark, sf_oracle):
    """The amortized path (IvfIndex.save -> load ->
    semantic_dedup_groups_from_index) must produce the exact group
    assignment of the one-shot form given the same fitted index — the
    fit is the only stochastic stage, so sharing it makes the rest
    bit-deterministic."""
    import shutil
    import tempfile

    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.semdedup import (
        semantic_dedup_groups_from_index,
    )
    from big_data_tools_spark.operators.similarity import IvfIndex

    emb = load_table(spark, sf_oracle, "embeddings")
    index = IvfIndex.fit(
        emb, "vec_id", "embedding", 8, max_iter=8, init_mode="random",
        fit_sample_cap=100_000,
    )
    direct = {
        (r["vec_id"], r["keep_id"])
        for r in semantic_dedup_groups_from_index(
            index, "vec_id", threshold=0.45
        ).collect()
    }
    d = tempfile.mkdtemp(prefix="bdt_ivf_idx_")
    try:
        index.save(d)
        index.unpersist()
        loaded = IvfIndex.load(spark, d)
        via_disk = {
            (r["vec_id"], r["keep_id"])
            for r in semantic_dedup_groups_from_index(
                loaded, "vec_id", threshold=0.45
            ).collect()
        }
        loaded._assigned.unpersist()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert direct == via_disk
    assert direct  # non-vacuous: sf0.01 embeddings do contain groups


def test_dedup_components_trace_star_forest_invariant(spark):
    """The registered trace query's final round must describe the
    star-forest fixpoint: n_edges = n_nodes - n_components (one edge
    per non-root node), against dedup_components' own group count."""
    from big_data_tools_spark.operators.cache import release_all_caches, release_caches
    from big_data_tools_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    reg = all_queries()
    tr = reg["dedup_components_trace"].fn(spark, sf)
    rows = sorted((r["round"], r["n_nodes"], r["n_edges"]) for r in tr.collect())
    release_caches(tr)
    release_all_caches()
    comp = reg["dedup_components"].fn(spark, sf)
    n_components = comp.count()
    release_caches(comp)
    release_all_caches()
    assert rows, "empty trace"
    _, n_nodes, n_edges = rows[-1]
    assert n_edges == n_nodes - n_components, (rows, n_components)
