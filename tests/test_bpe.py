"""Distributed BPE training/encoding (operators/bpe.py).

The golden merges are hand-computed on the Sennrich et al. example
corpus (low/lower/newest/widest, no end-of-word marker):
pair counts round 1 put (e,s) and (s,t) at 9 — lexicographic
tie-break picks (e,s); then (es,t)=9, then (l,o) ties (o,w) at 7 and
wins lexicographically, then (lo,w)=7.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_tools_spark.operators.bpe import (
    bpe_encode_expr,
    bpe_encode_with_vocab,
    bpe_train,
)


def _corpus(spark):
    rows = (
        [(i, "low") for i in range(5)]
        + [(100 + i, "lower") for i in range(2)]
        + [(200 + i, "newest") for i in range(6)]
        + [(300 + i, "widest") for i in range(3)]
    )
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_golden_merges_and_vocab(spark):
    merges, vocab = bpe_train(_corpus(spark), "text", num_merges=4, min_freq=2)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    decomp = {r["word"]: r["syms"] for r in vocab.collect()}
    assert decomp == {
        "low": ["low"],
        "lower": ["low", "e", "r"],
        "newest": ["n", "e", "w", "est"],
        "widest": ["w", "i", "d", "est"],
    }
    vocab.unpersist()


def test_expression_encoder_handles_oov(spark):
    merges, vocab = bpe_train(_corpus(spark), "text", num_merges=4, min_freq=2)
    df = spark.createDataFrame([("lowest newest",)], ["text"])
    out = df.select(bpe_encode_expr(F.col("text"), merges).alias("t")).collect()[0]["t"]
    # 'lowest' was never trained on, yet its subwords compose correctly
    assert out == ["low", "est", "n", "e", "w", "est"]
    vocab.unpersist()


def test_vocab_encoder_matches_expression_encoder(spark):
    corpus = _corpus(spark)
    merges, vocab = bpe_train(corpus, "text", num_merges=4, min_freq=2)
    via_vocab = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode_with_vocab(corpus, "text", "doc_id", vocab).collect()
    }
    via_expr = {
        r["doc_id"]: r["t"]
        for r in corpus.select(
            "doc_id", bpe_encode_expr(F.col("text"), merges).alias("t")
        ).collect()
    }
    assert via_vocab == via_expr
    vocab.unpersist()


def test_roundtrip_concatenation(spark):
    """BPE never loses characters: concatenating a word's subwords
    reproduces the word."""
    corpus = _corpus(spark)
    merges, vocab = bpe_train(corpus, "text", num_merges=4, min_freq=2)
    for r in vocab.collect():
        assert "".join(r["syms"]) == r["word"]
    vocab.unpersist()


def test_min_freq_stops_training(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "cd")], ["doc_id", "text"])
    merges, vocab = bpe_train(df, "text", num_merges=10, min_freq=2)
    # every pair occurs once -> no merge clears min_freq=2
    assert merges == []
    vocab.unpersist()
