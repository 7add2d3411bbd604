"""DSIR importance weighting (operators/dsir.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_tools_spark.operators.dsir import dsir_weights, ngram_features


def _weights(spark, hash_buckets=None):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", True),
            (2, "the cat ate the fish", True),
            (3, "stock market prices fell sharply", False),
            (4, "the cat chased the mouse", False),
            (5, "market prices rose on monday", False),
        ],
        ["doc_id", "text", "is_tgt"],
    )
    out = dsir_weights(
        df, "text", "doc_id", is_target=F.col("is_tgt"), hash_buckets=hash_buckets
    )
    return {r["doc_id"]: r["dsir_weight"] for r in out.collect()}


def test_target_like_docs_rank_higher(spark):
    w = _weights(spark)
    # doc 4 shares the target's cat-vocabulary; docs 3/5 are market-speak
    assert w[4] > w[3] and w[4] > w[5]
    # the target docs themselves score above every non-target doc
    assert min(w[1], w[2]) > max(w[3], w[5])


def test_hashed_features_match_exact_at_low_collision(spark):
    exact = _weights(spark)
    hashed = _weights(spark, hash_buckets=1 << 22)
    # with ~4M buckets over a tiny vocab, collisions are (almost surely)
    # absent, so the hashed model reproduces the exact ranking
    exact_rank = sorted(exact, key=lambda d: (-exact[d], d))
    hashed_rank = sorted(hashed, key=lambda d: (-hashed[d], d))
    assert exact_rank == hashed_rank


def test_ngram_features_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame([("a b c",), ("solo",)], ["text"])
    rows = df.select(ngram_features(F.col("text")).alias("f")).collect()
    assert rows[0]["f"] == ["a", "b", "c", "a b", "b c"]
    assert rows[1]["f"] == ["solo"]  # no descending-sequence bigram blowup
