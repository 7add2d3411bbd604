"""Product-quantization ANN (operators/pq.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.operators.pq import PqIndex, pq_topk
from big_data_tools_spark.operators.similarity import brute_force_topk

SF = "/root/testdata/sf0.001"


def _topk_sets(df, id_field="neighbor_id"):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r[id_field])
    return out


def test_refined_search_recalls_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    bf = _topk_sets(brute_force_topk(emb, q, k=5))

    idx = PqIndex.fit(emb, m=16, k_codes=64)
    got = _topk_sets(idx.search(q, k=5, refine=50, corpus=emb))
    idx.unpersist()

    hits = sum(len(got.get(qid, set()) & bf[qid]) for qid in bf)
    total = sum(len(v) for v in bf.values())
    assert hits / total >= 0.8, f"refined PQ recall {hits/total:.2f} < 0.8"


def test_adc_exact_when_codebook_covers_corpus(spark):
    """With one centroid per distinct subvector, quantization is
    lossless and ADC reproduces exact cosine of normalized vectors."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 2.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 3.0, 3.0]),
        (3, [1.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = PqIndex.fit(df, m=2, k_codes=4, max_iter=30)
    out = {
        (r["query_id"], r["neighbor_id"]): r["adc_sim"]
        for r in idx.search(df.filter(F.col("vec_id") == 3), k=3).collect()
    }
    idx.unpersist()
    # cos((1,1,0,0)/sqrt2, (1,0,0,0)) = 1/sqrt2 ~ 0.7071; same for id 1
    assert out[(3, 0)] == pytest.approx(0.7071, abs=1e-4)
    assert out[(3, 1)] == pytest.approx(0.7071, abs=1e-4)
    assert out[(3, 2)] == pytest.approx(0.0, abs=1e-4)


def test_fit_rejects_indivisible_dim(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        PqIndex.fit(df, m=2)


def test_determinism(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    a = pq_topk(emb, q, k=5, m=16, k_codes=16)
    b = pq_topk(emb, q, k=5, m=16, k_codes=16)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    from big_data_tools_spark.operators.cache import release_all_caches

    release_all_caches()


def test_search_query_guard(spark):
    emb = load_table(spark, SF, "embeddings")
    idx = PqIndex.fit(emb, m=8, k_codes=16)
    with pytest.raises(ValueError, match="max_queries"):
        idx.search(emb, max_queries=10)
    idx.unpersist()
