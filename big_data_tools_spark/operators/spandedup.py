"""Cross-document duplicated-span coverage — the measurement half of
exact-substring deduplication (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022).

The suffix-array ExactSubstr algorithm finds maximal byte spans
repeated across a corpus; its distributed Spark analog works at token
k-gram granularity:

1. explode every token position's k-gram (an engine-portable md5/16
   key — same policy as the hashed shingles in ``dedup.py``);
2. one grouped aggregate finds grams occurring in >= 2 DISTINCT docs
   (within-doc repetition is the Gopher repetition filter's job —
   ``text.py:repetition_ratio`` — not this operator's);
3. join the duplicated-gram set back to the positions and union the
   overlapping [pos, pos+k) intervals per document with a running-max
   window (no per-doc collect, no quadratic interval merge);
4. covered-token count / doc length = the fraction of the document
   that is copied from elsewhere in the corpus — the number
   ExactSubstr would cut.

Scale shape: two shuffles (gram group-by, positions re-join) plus one
doc-partitioned window. The gram table is the big intermediate —
O(total tokens) rows of 16-byte keys; ``max_gram_docs`` caps
pathological boilerplate grams (df in the millions) the same way
``jaccard_pairs`` caps posting lists, trading recall on ubiquitous
spans for a bounded join fan-out (flagged spans that common are
boilerplate, which `queries/text.py:boilerplate_ngrams` reports
separately).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def _gram_key(toks, pos, k: int):
    """Engine-portable k-gram identity: md5/16 of the space-joined
    slice (DuckDB renders the identical bytes)."""
    return F.substring(F.md5(F.concat_ws(" ", F.slice(toks, pos + 1, k))), 1, 16)


def position_grams(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, gram) for every token position; docs shorter than
    k tokens yield no rows (and later count as coverage 0)."""
    from .partitioning import fan_out

    # single-file corpora read as one partition; spread the per-row
    # gram explode (the expensive step) across the cluster first
    sized = fan_out(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("t"),
    ).withColumn("n", F.size("t"))
    return (
        sized.filter(F.col("n") >= k)
        .select(
            "doc_id",
            F.posexplode(F.sequence(F.lit(0), F.col("n") - k)).alias("pos", "_i"),
            "t",
        )
        .select("doc_id", "pos", _gram_key(F.col("t"), F.col("pos"), k).alias("gram"))
    )


def duplicated_span_coverage(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_docs: int = 10_000,
) -> DataFrame:
    """Per-document duplicated-span coverage: (doc_id, covered, n_tok,
    dup_coverage). ``covered`` is the union length of all [pos, pos+k)
    intervals whose k-gram occurs in >= 2 distinct documents."""
    from .cache import track_cache

    # the gram stream feeds the df aggregate AND the positions re-join;
    # persist it so the tokenize+gram explode runs once (same policy as
    # jaccard_pairs' persisted shingle index — at corpus scale the
    # recompute costs more than the storage)
    grams = position_grams(docs, k=k, id_col=id_col, text_col=text_col).persist()

    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_gram_docs))
        .select("gram")
    )
    spans = grams.join(dup_grams, "gram").select(
        "doc_id", "pos", (F.col("pos") + k).alias("end")
    )

    # Interval union via running max: contribution of each span is the
    # part of [pos, end) not already covered by any earlier span.
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = (
        spans.withColumn("prev_end", F.max("end").over(w_prev))
        .select(
            "doc_id",
            F.greatest(
                F.lit(0),
                F.col("end")
                - F.greatest(F.col("pos"), F.coalesce(F.col("prev_end"), F.col("pos"))),
            ).alias("add"),
        )
        .groupBy("doc_id")
        .agg(F.sum("add").alias("covered"))
    )

    lengths = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"),
    )
    out = (
        lengths.join(covered, "doc_id", "left_outer")
        .withColumn("covered", F.coalesce(F.col("covered"), F.lit(0)))
        .withColumn(
            "dup_coverage",
            F.round(F.col("covered") / F.col("n_tok"), 6),
        )
    )
    return track_cache(out, grams)
