"""Benchmark-contamination detection: which training documents share
n-grams with a held-out evaluation set?

Standard practice before pretraining (GPT-3 appendix C, PaLM §7,
Llama-2 A.6): an eval example is "contaminated" if enough of its
n-grams appear in a training document. The reference repo has no such
operator; this extends its dedup surface (SURVEY.md §2.11) to the
train-vs-eval axis the same inverted-index way.

Scale shape: both sides shingle to distinct word n-grams, hashed to
8-byte keys (xxhash64) so the join shuffles fixed-width ints, never
text. The eval side is tiny relative to a 100 TB corpus (thousands of
benchmark examples), so Spark/AQE broadcasts its index and the train
corpus is never shuffled at all — the operator is a single broadcast
hash join + grouped count over the training shingle stream. A
doc-frequency cap on the TRAIN side drops boilerplate shingles that
would otherwise match every eval doc and explode the joined row count
(same guard as ``dedup.jaccard_pairs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_index


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_shared: int = 1,
    max_doc_freq: int | None = 10_000,
) -> DataFrame:
    """Per-training-doc contamination report against ``test``.

    Returns (train_id, n_test_docs, max_shared): how many distinct eval
    docs this training doc collides with, and the largest number of
    distinct shared ``n``-grams with any single one. Only training docs
    with at least one qualifying collision (``shared >= min_shared``)
    appear — at corpus scale the clean majority never leaves the join.
    """
    from .cache import track_cache

    tr = shingle_index(train, text_col, id_col, n, hashed=True)
    # the eval index feeds two broadcasts (its distinct shingle set and
    # the shingle->test_id map); persist so the eval scan runs once
    te = (
        shingle_index(test, text_col, id_col, n, hashed=True)
        .select(F.col("doc").alias("test_id"), "shingle")
        .persist()
    )
    # eval side is the small side by construction — broadcast it so the
    # train corpus streams through map-side; AQE would pick this up at
    # runtime, the hint makes it deterministic. Narrow to eval shingles
    # BEFORE any aggregation: the clean bulk of the corpus exits here
    # without ever shuffling.
    hits = tr.join(F.broadcast(te.select("shingle").distinct()), "shingle")
    if max_doc_freq is not None:
        # df of a shingle only matters if the eval set contains it, and
        # `hits` keeps every train row for such shingles — so df computed
        # on the matched stream equals global train df, at a fraction of
        # the cost of aggregating the full index. Bounds the pair
        # expansion below before it happens. The matched stream is tiny
        # vs the corpus (contamination is the exception, not the rule);
        # persist it so the df pass and the pair join share one train scan.
        hits = hits.persist()
        freq = hits.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        capped = hits.join(
            F.broadcast(freq.filter(F.col("df") <= max_doc_freq).select("shingle")),
            "shingle",
        )
    else:
        capped = hits
    shared = (
        capped.join(F.broadcast(te), "shingle")
        .groupBy(F.col("doc").alias("train_id"), "test_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    out = shared.groupBy("train_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_docs"),
        F.max("shared").cast("bigint").alias("max_shared"),
    )
    return track_cache(out, te, hits)
