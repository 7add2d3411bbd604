"""Composed pretraining-corpus pipeline (SURVEY.md §2.11 capstone):
the north-star text ops chained the way a real 100 TB corpus build
chains them — PII scrub -> quality score -> language ID -> exact dedup
-> per-source stats — in ONE declarative plan.

Everything stays a single Catalyst plan: the scrub/score/lang steps
are narrow projections (no shuffle), dedup is one window over the
content fingerprint, and the final rollup is one grouped aggregate —
two shuffles for the whole pipeline regardless of corpus size (plus
the fan_out input-spread guard, which no-ops on well-split inputs).
The DuckDB twin composes the same SQL fragments the individual
queries pin, so the composition is oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.agg import dmean, sql_dmean
from ..io.sources import load_table
from ..operators.partitioning import fan_out
from ..operators.text import (
    PII_PATTERNS,
    STOPWORDS_EN,
    fingerprint,
    lang_id_from_tokens,
    quality_score_from_tokens,
    scrub_pii,
    token_count,
    tokens,
)
from .registry import register
from .text import _lang_case_sql

_QUALITY_MIN = 0.5
_KEEP_LANG = "en"
_SW = ", ".join(f"'{w}'" for w in STOPWORDS_EN)


def _corpus_sql() -> str:
    scrub = "text"
    for _, pat, token in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    quality = (
        "least(n_tok / 100.0, 1.0) * 0.4"
        " + least((sw_hits * 1.0 / n_tok) * 4, 1.0) * 0.3"
        " + greatest(0.0, 1.0 - (n_bad * 1.0 / n_chars) * 5) * 0.3"
    )
    return f"""
    WITH scrubbed AS (
        SELECT doc_id, source, {scrub} AS text FROM documents
    ), scored AS (
        SELECT doc_id, source,
               len(string_split(lower(text), ' ')) AS n_tok,
               len(list_filter(string_split(lower(text), ' '),
                   t -> t IN ({_SW}))) AS sw_hits,
               length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS n_bad,
               length(lower(text)) AS n_chars,
               {_lang_case_sql()} AS pred_lang,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        FROM scrubbed
    ), kept AS (
        SELECT doc_id, source, n_tok, fp, {quality} AS quality
        FROM scored
        WHERE {quality} >= {_QUALITY_MIN} AND pred_lang = '{_KEEP_LANG}'
    ), deduped AS (
        SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM kept
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           {sql_dmean('quality', 3)} AS avg_quality
    FROM deduped WHERE doc_id = keep_id
    GROUP BY source
    """


@register(
    "pretraining_corpus_pipeline",
    sql=_corpus_sql(),
    doc="Capstone composition of the north-star text ops as one "
    "Catalyst plan: PII scrub (chained regexp_replace) -> heuristic "
    "quality score -> marker-argmax language ID -> exact dedup (min "
    "doc per md5 fingerprint, one window) -> per-source corpus stats. "
    "Narrow projections until the dedup window; two shuffles total at "
    "any corpus size. Oracle twin composes the same SQL fragments the "
    "per-op queries pin, so the composition is checked end to end.",
)
def pretraining_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan-shape note: filtering directly on computed quality/pred_lang
    # columns lets predicate pushdown inline the WHOLE scoring
    # expression tree below the fan_out repartition — the filter then
    # runs single-task on the raw input AND every score is computed
    # twice (measured 3.8s vs 1.3s at sf0.1). Instead the scores ride
    # through the dedup Window (same fp partitioning, so they are
    # per-partition constants and min() is the identity): the Window is
    # a natural pushdown barrier — each score is computed exactly once,
    # after the shuffle, on all cores. Cost: the fp shuffle carries the
    # sub-threshold rows too (~30% here); the win: no double compute,
    # no single-task filter.
    d = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    scrubbed = d.withColumn("text", scrub_pii(F.col("text")))
    toked = scrubbed.withColumn("toks", tokens(F.col("text"))).withColumn(
        "fp", fingerprint(F.col("text"))
    )
    w = Window.partitionBy("fp")
    staged = toked.select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("n_tok"),
        F.min("doc_id").over(w).alias("keep_id"),
        F.min(
            quality_score_from_tokens(F.col("toks"), F.col("text"))
        ).over(w).alias("quality"),
        F.min(lang_id_from_tokens(F.col("toks"))).over(w).alias("pred_lang"),
    )
    kept = staged.filter(
        (F.col("quality") >= _QUALITY_MIN)
        & (F.col("pred_lang") == _KEEP_LANG)
        & (F.col("doc_id") == F.col("keep_id"))
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        dmean(F.col("quality"), 3).alias("avg_quality"),
    )
