"""Property pins for the second round-7 operator wave: CMS heavy
hitters, Bloom semi-join audit, nDCG@k ranking eval, tokenizer
fertility, vocabulary coverage curve.

Oracle parity for all five is covered by tests/test_oracle_parity.py
(they are registered twins); these tests pin the operator-level
GUARANTEES the twins cannot express — one-sided sketch error, no
Bloom false negatives, nDCG bounds, curve monotonicity — plus the
r7 partition-count-invariance discipline.
"""

from __future__ import annotations

import hashlib

import pytest

from big_data_tools_spark.operators.cache import release_all_caches
from big_data_tools_spark.queries import all_queries

_WAVE = [
    "events_cms_heavy_hitters",
    "bloom_semijoin_audit",
    "bm25_ndcg_eval",
    "doc_tokenizer_fertility",
    "vocab_coverage_curve",
]


def _run(spark, name, sf_dir):
    df = all_queries()[name].fn(spark, sf_dir)
    rows = df.collect()
    release_all_caches()
    return rows


def test_cms_one_sided_error_and_linearity(spark, sf_smoke):
    rows = _run(spark, "events_cms_heavy_hitters", sf_smoke)
    assert len(rows) == 10
    for r in rows:
        # CMS never underestimates (hash collisions only ADD counts)
        assert r.overestimate >= 0, r
        assert r.cms_est >= r.exact_count
        # the sketch is linear: per-type partials sum to the global grid
        assert r.merge_identity_ok is True


def test_bloom_no_false_negatives(spark, sf_smoke):
    (r,) = _run(spark, "bloom_semijoin_audit", sf_smoke)
    # every true member passes the filter: accepted >= true matches
    assert r.n_accepted >= r.n_true
    assert r.n_false_pos == r.n_accepted - r.n_true
    assert 0.0 <= r.fp_observed <= 1.0
    assert 0.0 <= r.fp_predicted <= 1.0
    # the filter is usefully selective at this load (not saturated)
    assert r.n_bits_set < r.filter_bits


def test_ndcg_bounds(spark, sf_smoke):
    (r,) = _run(spark, "bm25_ndcg_eval", sf_smoke)
    assert r.k == 10
    assert 0 <= r.dcg_micro <= r.idcg_micro
    assert 0.0 <= r.ndcg <= 1.0
    # the synthetic corpus contains the query terms, so the ranking
    # retrieves something relevant
    assert r.idcg_micro > 0


def test_fertility_sane(spark, sf_smoke):
    rows = _run(spark, "doc_tokenizer_fertility", sf_smoke)
    assert rows
    for r in rows:
        # BPE-ish pre-tokens split punctuation off words, so fertility
        # is at least ~1 token per whitespace word
        assert r.fertility >= 1.0, r
        assert r.chars_per_token > 0
        assert r.total_tokens >= r.total_words > 0


def test_coverage_curve_monotone(spark, sf_smoke):
    rows = sorted(
        _run(spark, "vocab_coverage_curve", sf_smoke),
        key=lambda r: r.vocab_size,
    )
    assert [r.vocab_size for r in rows] == [1000, 2000, 4000, 8000, 16000]
    prev = -1
    for r in rows:
        assert r.covered_tokens <= r.total_tokens
        assert r.covered_tokens >= prev  # more vocab never covers less
        prev = r.covered_tokens
        assert 0.0 <= r.coverage <= 1.0
    # once V >= n_types the curve is exactly 1
    for r in rows:
        if r.vocab_size >= r.n_types:
            assert r.coverage == 1.0


def _rowset_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted("|".join(repr(r[c]) for c in cols) for r in df.collect())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", _WAVE)
def test_partition_count_invariance(spark, sf_smoke, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = []
    for parts in (2, 13):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            hashes.append(_rowset_hash(all_queries()[name].fn(spark, sf_smoke)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
            release_all_caches()
    assert hashes[0] == hashes[1], f"{name}: rowset differs across partitions"


_WAVE3 = [
    "customer_ldiversity",
    "corpus_ngram_entropy",
    "embedding_centroid_shift",
]


def test_ldiversity_sane(spark, sf_smoke):
    rows = _run(spark, "customer_ldiversity", sf_smoke)
    assert rows
    for r in rows:
        assert 1 <= r.l_distinct <= 5  # 5 TPC-H priorities exist
        assert r.l_diverse == (r.l_distinct >= 3)
        assert r.n_orders >= r.n_customers >= 1


def test_ngram_entropy_information_theory(spark, sf_smoke):
    import math

    (r,) = _run(spark, "corpus_ngram_entropy", sf_smoke)
    # 0 <= H <= log2(|alphabet|)
    assert 0.0 <= r.unigram_bits <= math.log2(r.n_types) + 1e-6
    assert 0.0 <= r.bigram_bits <= math.log2(r.n_bigram_types) + 1e-6
    # subadditivity: H(w1,w2) <= 2*H(w) and H(w1,w2) >= H(w)
    assert r.bigram_bits <= 2 * r.unigram_bits + 1e-6
    assert r.bigram_bits >= r.unigram_bits - 1e-6
    # conditioning reduces entropy: 0 <= H(w2|w1) <= H(w)
    assert -1e-6 <= r.conditional_bits <= r.unigram_bits + 1e-6


def test_centroid_shift_nonnegative(spark, sf_smoke):
    rows = _run(spark, "embedding_centroid_shift", sf_smoke)
    assert rows
    for r in rows:
        assert r.centroid_shift >= 0.0
        assert r.n_a > 0 and r.n_b > 0


@pytest.mark.parametrize("name", _WAVE3)
def test_partition_count_invariance_wave3(spark, sf_smoke, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = []
    for parts in (2, 13):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            hashes.append(_rowset_hash(all_queries()[name].fn(spark, sf_smoke)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
            release_all_caches()
    assert hashes[0] == hashes[1], f"{name}: rowset differs across partitions"


def test_quantile_sketch_bounds(spark, sf_smoke):
    rows = _run(spark, "orders_price_quantile_sketch", sf_smoke)
    assert sorted(r.q_permille for r in rows) == [500, 900, 990]
    for r in rows:
        assert r.merge_identity_ok is True
        assert 1 <= r.target_rank <= r.n_rows
        # the estimate lands within one bin width of the exact value
        # (interpolation error is bounded by the declared bin width)
        assert r.abs_err_cents <= 800_000
        assert r.est_cents >= 0
    p = {r.q_permille: r.exact_cents for r in rows}
    assert p[500] <= p[900] <= p[990]  # quantiles are monotone


def test_local_bridges_consistent(spark, sf_smoke):
    (r,) = _run(spark, "copurchase_local_bridges", sf_smoke)
    assert 0 <= r.n_bridge_edges <= r.n_edges
    assert abs(r.bridge_share - round(r.n_bridge_edges / r.n_edges, 6)) < 1e-9
    # an edge in a triangle is NOT a local bridge: if every edge were
    # in a triangle, bridges would be 0; sanity-check the complement
    if r.n_triangles == 0:
        assert r.n_bridge_edges == r.n_edges
    # brute-force replication on the same thresholded repeat graph
    from big_data_tools_spark.queries.graph import _repeat_und

    edges = {(e.a, e.b) for e in _repeat_und(spark, sf_smoke).collect()}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    bridges = sum(1 for a, b in edges if not (adj[a] & adj[b]))
    tris = sum(len(adj[a] & adj[b]) for a, b in edges) // 3
    assert r.n_edges == len(edges)
    assert r.n_bridge_edges == bridges
    assert r.n_triangles == tris


@pytest.mark.parametrize(
    "name", ["orders_price_quantile_sketch", "copurchase_local_bridges"]
)
def test_partition_count_invariance_wave4(spark, sf_smoke, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = []
    for parts in (2, 13):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            hashes.append(_rowset_hash(all_queries()[name].fn(spark, sf_smoke)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
            release_all_caches()
    assert hashes[0] == hashes[1], f"{name}: rowset differs across partitions"


def test_ngram_entropy_degenerate_docs(spark, tmp_path):
    """Planted regression: empty-text / whitespace-only / single-token
    docs must neither crash the Spark bigram slice (negative slice
    length) nor diverge from the DuckDB twin on the same data."""
    import os

    import duckdb

    from .oracle import compare

    d = str(tmp_path)
    duckdb.sql(
        f"""
        COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
              UNION ALL SELECT 999991, '', 'en', 'web', 0
              UNION ALL SELECT 999992, ' ', 'en', 'web', 1
              UNION ALL SELECT 999993, 'single', 'en', 'web', 6)
        TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet"
        )
    ok, msg = compare(spark, all_queries()["corpus_ngram_entropy"], d)
    assert ok, msg
