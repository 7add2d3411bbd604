"""Similarity-search queries over the embeddings table (SURVEY.md §2.11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.agg import dmean, sql_dmean
from ..io.sources import load_table
from ..operators.similarity import brute_force_topk, l2_norm, lsh_ann_topk
from .registry import register


@register(
    "knn_cosine_brute",
    sql="""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id,
               round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                     4) AS cos_sim
        FROM q CROSS JOIN c WHERE query_id != neighbor_id
    )
    SELECT * FROM (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
               ) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
    doc="Exact brute-force cosine top-k (north-star ANN baseline): "
    "broadcast query set x corpus, zip_with/aggregate dot product "
    "(no UDF), window rank with deterministic tiebreak.",
)
def knn_cosine_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5)


@register(
    "knn_lsh_ann",
    sql=None,  # LSH random hyperplanes are Spark-seeded; no SQL twin
    doc="Approximate NN via BucketedRandomProjectionLSH bucket join "
    "(north-star scale path). Rows-only driver check; recall vs the "
    "brute-force oracle asserted in tests/test_similarity.py.",
)
def knn_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_ann_topk(emb, queries, k=5)


@register(
    "embedding_label_stats",
    sql=f"""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           {sql_dmean("sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), "
                      "CAST(embedding AS DOUBLE[])))", 3)} AS avg_norm
    FROM embeddings GROUP BY label
    """,
    doc="Vector norm stats per label: array arithmetic via "
    "transform/aggregate expressions (north-star embedding ops).",
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", l2_norm(F.col("embedding")).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            dmean(F.col("norm"), 3).alias("avg_norm"),
        )
    )


@register(
    "knn_ivf_ann",
    sql=None,  # KMeans routing is Spark-seeded; recall vs brute tested
    doc="IVF-style approximate NN (north-star scale path beside LSH): "
    "seeded KMeans inverted lists, queries probe their 4 nearest of "
    "16 centroids, exact cosine within probed lists only — "
    "cost ~ n_probe/n_clusters of brute force. Rows-only driver "
    "check; recall vs knn_cosine_brute asserted in "
    "tests/test_similarity.py.",
)
def knn_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, k=5, n_clusters=16, n_probe=4)
