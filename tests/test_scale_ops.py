"""Tests for the scale-technique operators (skew salting, sketches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.operators.skew import salted_aggregate
from big_data_tools_spark.queries import get


def test_salted_aggregate_equals_direct_groupby(spark, sf_smoke):
    o = load_table(spark, sf_smoke, "orders")
    direct = {
        r["o_orderstatus"]: r
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count("o_totalprice").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
            F.max("o_totalprice").alias("m"),
        )
        .collect()
    }
    salted = {
        r["o_orderstatus"]: r
        for r in salted_aggregate(
            o,
            ["o_orderstatus"],
            {
                "n": ("count", F.col("o_totalprice")),
                "s": ("sum", F.col("o_totalprice").cast("decimal(18,2)")),
                "m": ("max", F.col("o_totalprice")),
            },
        ).collect()
    }
    assert direct.keys() == salted.keys()
    for k in direct:
        assert direct[k]["n"] == salted[k]["n"]
        assert direct[k]["s"] == salted[k]["s"]  # decimal: exact equality
        assert direct[k]["m"] == salted[k]["m"]


def test_approx_distinct_within_error_band(spark, sf_smoke):
    row = get("approx_distinct_sketch").fn(spark, sf_smoke).first()
    li = load_table(spark, sf_smoke, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("o"),
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_suppkey").alias("s"),
    ).first()
    for approx_col, exact_val in [
        ("approx_orders", exact["o"]),
        ("approx_parts", exact["p"]),
        ("approx_suppliers", exact["s"]),
    ]:
        rel_err = abs(row[approx_col] - exact_val) / max(exact_val, 1)
        assert rel_err < 0.1, f"{approx_col}: {row[approx_col]} vs {exact_val}"


def test_approx_percentile_tracks_exact(spark, sf_oracle):
    from big_data_tools_spark.queries import get

    exact = {
        r["source"]: (r["p50"], r["p90"], r["p99"])
        for r in get("doc_length_quantiles").fn(spark, sf_oracle).collect()
    }
    approx = {
        r["source"]: (r["p50"], r["p90"], r["p99"])
        for r in get("doc_length_quantiles_approx").fn(spark, sf_oracle).collect()
    }
    assert set(exact) == set(approx)
    for src, (p50, p90, p99) in exact.items():
        a50, a90, a99 = approx[src]
        # bands account for the sketch returning actual data values
        # while the exact form interpolates — sparse tails diverge more
        assert abs(a50 - p50) / max(p50, 1) < 0.05
        assert abs(a90 - p90) / max(p90, 1) < 0.10
        assert abs(a99 - p99) / max(p99, 1) < 0.15


def test_stratified_hash_sample_rates_and_determinism(spark, sf_oracle):
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.sampling import (
        stratified_hash_sample,
        train_test_split_by_key,
    )

    d = load_table(spark, sf_oracle, "documents")
    fr = {"en": 0.5, "de": 0.25}
    s = stratified_hash_sample(d, "doc_id", "lang", fr)
    base = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= set(fr)  # unlisted strata dropped
    for lang, frac in fr.items():
        rate = got.get(lang, 0) / base[lang]
        assert abs(rate - frac) < 0.08, f"{lang}: {rate:.3f} vs {frac}"
    # determinism under different partitioning
    ids1 = {r["doc_id"] for r in s.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_hash_sample(d.repartition(7), "doc_id", "lang", fr)
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2
    # leakage-safe split: disjoint, covering, key-stable
    tr, te = train_test_split_by_key(d, "doc_id", 0.3)
    assert tr.count() + te.count() == d.count()
    assert tr.select("doc_id").intersect(te.select("doc_id")).count() == 0


def test_weighted_sample_prefers_heavy_rows(spark):
    """Efraimidis-Spirakis: inclusion probability tracks weight. With
    weights 100:1, the top half of draws must be dominated by heavy
    rows; determinism across partitionings is exact."""
    from big_data_tools_spark.operators.sampling import weighted_sample_topk

    rows = [(i, 100 if i < 50 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long")
    picked = [r["id"] for r in weighted_sample_topk(df, "w", 40, "id").collect()]
    heavy = sum(1 for i in picked if i < 50)
    assert heavy >= 30, f"only {heavy}/40 heavy rows picked"
    # layout-independence: same selection at any partition count
    repicked = [
        r["id"]
        for r in weighted_sample_topk(df.repartition(13), "w", 40, "id").collect()
    ]
    assert sorted(picked) == sorted(repicked)
    # zero/negative weights are never sampled
    df2 = spark.createDataFrame([(1, 0), (2, -5), (3, 10)], "id long, w long")
    assert [r["id"] for r in weighted_sample_topk(df2, "w", 3, "id").collect()] == [3]


def test_temperature_mixture_flattens_toward_tail(spark):
    """tau>1 must move target shares toward uniform: the head group's
    target share drops below its raw share, every tail group's rises,
    and the budget sums to ~total."""
    from big_data_tools_spark.operators.sampling import temperature_mixture_plan

    rows = [("en",)] * 800 + [("fr",)] * 150 + [("sw",)] * 50
    df = spark.createDataFrame(rows, "lang string")
    plan = {r["lang"]: r for r in temperature_mixture_plan(df, "lang", tau=3.0).collect()}
    assert plan["en"]["target_share"] < plan["en"]["share"]
    assert plan["sw"]["target_share"] > plan["sw"]["share"]
    assert plan["fr"]["target_share"] > plan["fr"]["share"]
    total_budget = sum(r["target_n"] for r in plan.values())
    assert abs(total_budget - 1000) <= 2  # rounding slack only
    # tau=1 is a no-op: target share == share
    flat = {r["lang"]: r for r in temperature_mixture_plan(df, "lang", tau=1.0).collect()}
    for lang in ("en", "fr", "sw"):
        assert abs(flat[lang]["target_share"] - flat[lang]["share"]) < 1e-5
