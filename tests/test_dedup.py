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
