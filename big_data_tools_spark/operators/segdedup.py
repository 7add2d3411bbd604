"""Segment-level (line-level) deduplication with document reassembly.

The CCNet / RefinedWeb boilerplate-removal shape: instead of dropping
whole near-duplicate documents, drop the *segments* (lines, in a
newline-bearing corpus) that repeat across many documents — navigation
chrome, cookie banners, license boilerplate — and stitch the remaining
text back together in order. The driver's synthetic ``documents`` have
no newlines, so a "segment" here is a fixed run of ``seg_tokens``
consecutive tokens; a corpus with real line structure passes a
different splitter, the dataflow is identical.

Extends the reference's whole-row dedup (``dropDuplicates``,
``Databricks Notebook.py:160,611``) below document granularity.

Scale design (the plan at 100 TB):

- segmentation is a pure projection (``sequence``/``slice``/
  ``array_join`` — no shuffle, no UDF);
- duplicate detection is ONE grouped aggregation on the segment hash
  with a map-side combiner (count of distinct docs per hash);
- the duplicated-hash set is joined back on the hash key — it holds
  only hashes seen in >= ``min_docs`` documents, typically orders of
  magnitude smaller than the segment stream, so AQE broadcasts it;
  under adversarial boilerplate volume it degrades to a plain shuffle
  join on an 8-byte-comparable key, never an all-pairs product;
- reassembly is one grouped aggregation per document: segments are
  collected with their index and ``array_sort`` restores order, so the
  result is deterministic regardless of shuffle arrival order. State
  per group is bounded by document length, not corpus size.

Hashes are md5 of the segment text so the DuckDB oracle computes the
identical digest (same policy as operators/text.py fingerprint);
swap ``xxhash64`` in for a cheaper 8-byte shuffle key when oracle
comparability is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def segment_spans(text_col: Column, seg_tokens: int) -> Column:
    """array<struct<seg_idx:int, seg:string>> — consecutive
    ``seg_tokens``-token runs of the lowercased text, in order.

    Pure expression (no shuffle). ``split`` always yields >= 1 token,
    so every document has >= 1 segment (the last may be short).
    """
    toks = tokens(text_col)
    n_seg = F.greatest(F.ceil(F.size(toks) / F.lit(seg_tokens)), F.lit(1)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_seg - F.lit(1)),
        lambda i: F.struct(
            i.cast("int").alias("seg_idx"),
            F.array_join(
                F.slice(toks, i * F.lit(seg_tokens) + F.lit(1), F.lit(seg_tokens)), " "
            ).alias("seg"),
        ),
    )


def segment_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seg_tokens: int = 16,
    min_docs: int = 2,
) -> DataFrame:
    """Remove segments whose content repeats in >= ``min_docs`` distinct
    documents; reassemble each document from its surviving segments.

    Returns one row per input document:
    ``id_col, n_seg, n_removed, cleaned_text``.
    """
    segs = df.select(F.col(id_col), F.inline(segment_spans(F.col(text_col), seg_tokens)))
    hashed = segs.withColumn("h", F.md5(F.col("seg")))

    dup = (
        hashed.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= F.lit(min_docs))
        .select("h", F.lit(True).alias("is_dup"))
    )

    marked = hashed.join(dup, "h", "left").withColumn(
        "is_dup", F.coalesce(F.col("is_dup"), F.lit(False))
    )

    kept = F.array_sort(
        F.collect_list(
            F.when(~F.col("is_dup"), F.struct(F.col("seg_idx"), F.col("seg")))
        )
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_seg"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_removed"),
        F.array_join(F.transform(kept, lambda x: x["seg"]), " ").alias("cleaned_text"),
    )
