"""The dedup(df, tier=...) facade must route every tier to the exact
operator its registry query uses (r2 VERDICT ask #4) — same rows, same
columns — so driver-green correctness evidence transfers verbatim."""

from __future__ import annotations

import pytest

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_band_pairs,
    simhash64,
    simhash_candidate_pairs,
    winnow_pairs,
)
from big_data_tools_spark.operators.dedup_facade import TIERS, dedup
from big_data_tools_spark.operators.semdedup import semantic_dedup_pairs


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return load_table(spark, sf_smoke, "documents")


def test_winnow_tier_routes_to_winnow_pairs(docs):
    got = dedup(docs, tier="winnow", output="pairs", min_shared=3)
    want = winnow_pairs(docs, text_col="text", id_col="doc_id", min_shared=3)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_jaccard_tier_routes_to_jaccard_pairs(docs):
    got = dedup(docs, tier="jaccard", output="pairs", threshold=0.8)
    want = jaccard_pairs(docs, text_col="text", id_col="doc_id", threshold=0.8)
    assert _rows(got) == _rows(want)


def test_minhash_tier_routes_to_minhash_band_pairs(docs):
    got = dedup(docs, tier="minhash", output="pairs", threshold=0.7)
    want = minhash_band_pairs(docs, text_col="text", id_col="doc_id", threshold=0.7)
    assert _rows(got) == _rows(want)


def test_simhash_tier_routes_to_simhash_chain(docs):
    got = dedup(docs, tier="simhash", output="pairs", max_hamming=3)
    want = simhash_candidate_pairs(simhash64(docs, "text", "doc_id"), max_hamming=3)
    assert _rows(got) == _rows(want)


def test_semantic_tier_routes_to_semdedup(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    got = dedup(emb, tier="semantic", id_col="vec_id", output="pairs", threshold=0.95)
    want = semantic_dedup_pairs(emb, id_col="vec_id", vec_col="embedding", threshold=0.95)
    assert _rows(got) == _rows(want)


def test_exact_tier_groups_match_operator(docs):
    members = dedup(docs, tier="exact", output="groups")
    assert members.columns == ["id", "keep_id"]
    # every doc appears exactly once, and group sizes agree with the
    # operator the registry query uses
    assert members.count() == docs.count()
    sizes = {r["keep_id"]: r["n"] for r in members.groupBy("keep_id").count().withColumnRenamed("count", "n").collect()}
    want = {
        r["keep_id"]: r["group_size"]
        for r in exact_dedup_groups(docs, "text", "doc_id").collect()
    }
    assert sizes == want


def test_exact_tier_refuses_pair_expansion(docs):
    with pytest.raises(ValueError, match="grouped by construction"):
        dedup(docs, tier="exact", output="pairs")


def test_groups_output_is_transitive_closure(docs):
    pairs = dedup(docs, tier="winnow", output="pairs", min_shared=3)
    groups = dedup(docs, tier="winnow", output="groups", min_shared=3)
    # every paired doc lands in a group, keep_id = min id of the group
    paired = {r for p in pairs.collect() for r in (p["id_a"], p["id_b"])}
    got = {r["id"]: r["keep_id"] for r in groups.collect()}
    assert set(got) == paired
    assert all(keep <= i for i, keep in got.items())


def test_unknown_tier_and_output_fail_loudly(docs):
    with pytest.raises(ValueError, match="unknown dedup tier"):
        dedup(docs, tier="bloom")
    with pytest.raises(ValueError, match="output must be"):
        dedup(docs, tier="winnow", output="clusters")
    assert set(TIERS) == {
        "exact", "winnow", "jaccard", "containment",
        "minhash", "simhash", "semantic",
    }


def test_portable_hash_family_routes(docs):
    from big_data_tools_spark.operators.dedup import (
        minhash_band_pairs_portable,
        simhash_band_pairs_portable,
    )

    got = dedup(docs, tier="minhash", output="pairs", hash_family="portable")
    want = minhash_band_pairs_portable(docs, "text", "doc_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    got_s = dedup(docs, tier="simhash", output="pairs", hash_family="portable")
    want_s = simhash_band_pairs_portable(docs, "text", "doc_id")
    assert sorted(map(tuple, got_s.collect())) == sorted(map(tuple, want_s.collect()))


def test_portable_hash_family_rejected_elsewhere(docs):
    import pytest

    with pytest.raises(ValueError):
        dedup(docs, tier="jaccard", hash_family="portable")
    with pytest.raises(ValueError):
        dedup(docs, tier="minhash", hash_family="sha9000")


def test_survivors_output_exact_tier(spark, sf_smoke):
    from pyspark.sql import functions as F

    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.dedup import canonical_survivors
    from big_data_tools_spark.operators.dedup_facade import dedup

    docs = load_table(spark, sf_smoke, "documents")
    via_facade = dedup(
        docs, tier="exact", output="survivors", quality_col="n_chars"
    )
    direct = canonical_survivors(docs, "text", "doc_id", "n_chars").select(
        F.col("fingerprint").alias("group_key"),
        "group_size",
        F.col("keep_doc_id").alias("keep_id"),
        F.col("keep_n_chars").alias("keep_quality"),
    )
    assert sorted(map(tuple, via_facade.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_survivors_output_pair_tier_picks_best_per_closure(spark):
    from big_data_tools_spark.operators.dedup_facade import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today", 10),
        (2, "the quick brown fox jumps over the lazy dog today!", 50),
        (3, "a completely different document about spark plans here", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q int")
    out = dedup(
        df,
        tier="jaccard",
        output="survivors",
        quality_col="q",
        threshold=0.5,
    ).collect()
    by_keep = {r["keep_id"]: r for r in out}
    # 1 and 2 closure together; quality 50 wins
    assert 2 in by_keep and by_keep[2]["group_size"] == 2
    assert by_keep[2]["keep_quality"] == 50


def test_survivors_output_semantic_tier(spark):
    """ADVICE r4: the semantic tier's survivors path selected columns
    from the raw components schema instead of semantic_dedup_groups'
    (id, keep_id) output and raised UNRESOLVED_COLUMN — pin the mapping
    with a fixture where the duplicate group is unambiguous."""
    from big_data_tools_spark.operators.dedup_facade import dedup

    rows = [
        (1, [1.0, 0.0, 0.0], 10),
        (2, [0.999, 0.001, 0.0], 50),  # near-duplicate of 1
        (3, [0.0, 1.0, 0.0], 7),  # orthogonal singleton
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, q int")
    out = dedup(
        df,
        tier="semantic",
        id_col="vec_id",
        output="survivors",
        quality_col="q",
        threshold=0.95,
        n_clusters=2,
        fit_sample_cap=None,
    ).collect()
    assert set(r[0] for r in out[:0]) == set()  # schema sanity below
    assert out and out[0].asDict().keys() == {
        "group_key", "group_size", "keep_id", "keep_quality",
    }
    by_keep = {r["keep_id"]: r for r in out}
    # 1 and 2 group (cosine ~0.999); quality 50 wins the survivor rank
    assert 2 in by_keep and by_keep[2]["group_size"] == 2
    assert by_keep[2]["keep_quality"] == 50


def test_survivors_requires_quality_col(spark, sf_smoke):
    import pytest

    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.dedup_facade import dedup

    docs = load_table(spark, sf_smoke, "documents")
    with pytest.raises(ValueError, match="quality_col"):
        dedup(docs, tier="exact", output="survivors")


def test_containment_route_is_size_pinned():
    """r10 verdict next #3: the routing decision itself — exact prefix
    above the measured crossover (~sf0.1 corpus, 5k docs), the capped
    posting path only below it."""
    from big_data_tools_spark.operators.dedup_facade import (
        CONTAINMENT_CROSSOVER_DOCS,
        containment_route,
    )

    assert CONTAINMENT_CROSSOVER_DOCS == 5_000
    assert containment_route(CONTAINMENT_CROSSOVER_DOCS) == "capped"
    assert containment_route(CONTAINMENT_CROSSOVER_DOCS + 1) == "prefix"
    assert containment_route(50_000) == "prefix"  # the sf1 regime
    assert containment_route(500) == "capped"     # the sf0.01 regime


def test_containment_tier_routes_and_forces(docs):
    from big_data_tools_spark.operators.dedup import (
        containment_pairs,
        containment_prefix_pairs,
    )

    # sf_smoke corpus is tiny -> auto routes to the capped path
    got_auto = dedup(docs, tier="containment", output="pairs")
    want_capped = containment_pairs(docs, text_col="text", id_col="doc_id")
    assert sorted(map(tuple, got_auto.collect())) == sorted(
        map(tuple, want_capped.collect())
    )
    # method="prefix" forces the exact tier regardless of size
    got_prefix = dedup(docs, tier="containment", output="pairs", method="prefix")
    want_prefix = containment_prefix_pairs(docs, text_col="text", id_col="doc_id")
    assert sorted(map(tuple, got_prefix.collect())) == sorted(
        map(tuple, want_prefix.collect())
    )
    with pytest.raises(ValueError, match="containment method"):
        dedup(docs, tier="containment", method="fuzzy")
