"""Training-data selection queries (SURVEY.md §2.11, round 3).

DSIR (Xie et al. 2023) importance-based selection: rank the raw
document pool by target-vs-raw n-gram log-likelihood ratio and keep
the most target-like slice. The operator lives in operators/dsir.py;
this module registers the oracle-checked demonstration over the
driver's ``documents`` table, with ``source = 'src0'`` standing in for
the target corpus (a real run points it at wiki/books/curated text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from ..operators.dsir import dsir_weights
from ..operators.portablemath import pln_sql as _pln
from .registry import register

_DSIR_TARGET_SOURCE = "src0"
_DSIR_ALPHA = 0.5
_DSIR_TOPK = 100


@register(
    "dsir_target_selection",
    sql=f"""
    WITH base AS (
        SELECT doc_id, source, source = '{_DSIR_TARGET_SOURCE}' AS is_tgt,
               string_split(lower(text), ' ') AS toks
        FROM documents
    ), unis AS (
        SELECT doc_id, source, is_tgt, unnest(toks) AS f FROM base
    ), bis AS (
        SELECT doc_id, source, is_tgt, toks[i] || ' ' || toks[i+1] AS f
        FROM base, UNNEST(range(1, len(toks))) AS t(i)
    ), feats AS (
        SELECT * FROM unis WHERE f <> ''
        UNION ALL SELECT * FROM bis WHERE f <> ''
    ), model AS (
        SELECT f, CAST(count(*) AS BIGINT) AS rc,
               CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT) AS tc
        FROM feats GROUP BY f
    ), totals AS (
        SELECT sum(rc) AS t_raw, sum(tc) AS t_tgt, count(*) AS v FROM model
    ), scored AS (
        -- alpha = 1/2 folded into integer args: portable no-libm ln,
        -- same (a-b)-(c-d) association as operators/dsir._portable_llr
        SELECT f,
               ({_pln("2 * tc + 1")} - {_pln("2 * t_tgt + v")})
               - ({_pln("2 * rc + 1")} - {_pln("2 * t_raw + v")}) AS llr
        FROM model CROSS JOIN totals
    )
    SELECT fe.doc_id, fe.source,
           round(CAST(sum(CAST(round(s.llr, 6) AS DECIMAL(28,8))) AS DOUBLE),
                 4) AS dsir_weight
    FROM feats fe JOIN scored s USING (f)
    GROUP BY fe.doc_id, fe.source
    ORDER BY dsir_weight DESC, doc_id ASC
    LIMIT {_DSIR_TOPK}
    """,
    doc="DSIR importance-based data selection (operators/dsir.py): "
    "unigram+bigram LMs for target (source='src0') and raw pool fitted "
    "in ONE conditional-count aggregation, log-ratio model broadcast "
    "to the scoring join (the feature stream never shuffles on the "
    "hot feature key), per-doc quantized-decimal weight sum, "
    "deterministic top-k via TakeOrderedAndProject. At open-vocabulary "
    "scale the hash_buckets knob caps the broadcast model size "
    "(hashed n-gram trick; tests pin hashed==exact selection at low "
    "collision rates).",
)
def dsir_target_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    from ..operators.cache import track_cache

    weights = dsir_weights(
        d,
        "text",
        "doc_id",
        is_target=F.col("source") == _DSIR_TARGET_SOURCE,
        alpha=_DSIR_ALPHA,
        keep_cols=["source"],
    )
    out = weights.orderBy(
        F.col("dsir_weight").desc(), F.col("doc_id").asc()
    ).limit(_DSIR_TOPK)
    return track_cache(out, weights)  # re-tag: orderBy/limit drop the tag
