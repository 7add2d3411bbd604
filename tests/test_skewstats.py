"""Unit tests for key-distribution diagnostics
(operators/skewstats.py) with hand-computed Gini values."""

from __future__ import annotations

import pytest

from big_data_tools_spark.operators.skewstats import (
    heavy_hitters,
    kanonymity_violations,
    skew_summary,
)


def _keyed(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "key string")


def test_uniform_distribution_gini_zero(spark):
    df = _keyed(spark, {"a": 4, "b": 4, "c": 4})
    row = skew_summary(df, ["key"], top_n=2).collect()[0]
    # uniform: G = 2*(1*4+2*4+3*4)/(3*12) - 4/3 = 48/36 - 4/3 = 0
    assert row["n_keys"] == 3
    assert row["n_rows"] == 12
    assert row["gini"] == 0.0
    assert row["max_share"] == round(4 / 12, 6)
    assert row["topn_share"] == round(8 / 12, 6)


def test_skewed_distribution_gini_hand_value(spark):
    # counts ascending: [1, 1, 8]; n=3, total=10
    # sum(i*c_i) = 1*1 + 2*1 + 3*8 = 27
    # G = 2*27/(3*10) - 4/3 = 1.8 - 1.333333... = 0.466667
    df = _keyed(spark, {"a": 8, "b": 1, "c": 1})
    row = skew_summary(df, ["key"], top_n=1).collect()[0]
    assert row["gini"] == pytest.approx(0.466667, abs=1e-6)
    assert row["max_share"] == 0.8
    assert row["topn_share"] == 0.8


def test_gini_tie_runs_match_naive_ranking(spark):
    # ties: counts ascending [2, 2, 2, 6]; naive sum(i*c_i) with ANY
    # tie order = (1+2+3)*2 + 4*6 = 36; histogram closed form must
    # reproduce it: G = 2*36/(4*12) - 5/4 = 1.5 - 1.25 = 0.25
    df = _keyed(spark, {"a": 6, "b": 2, "c": 2, "d": 2})
    row = skew_summary(df, ["key"], top_n=2).collect()[0]
    assert row["gini"] == 0.25


def test_heavy_hitters_rank_and_share(spark):
    df = _keyed(spark, {"a": 5, "b": 3, "c": 3, "d": 1})
    rows = heavy_hitters(df, ["key"], top_n=3).collect()
    got = [(r["key"], r["cnt"], r["share"], r["rank"]) for r in rows]
    # ties (b, c) break by key ascending
    assert sorted(got, key=lambda t: t[3]) == [
        ("a", 5, round(5 / 12, 6), 1),
        ("b", 3, 0.25, 2),
        ("c", 3, 0.25, 3),
    ]


def test_kanonymity_flags_small_groups_and_nulls(spark):
    rows = [("US", "A")] * 5 + [("US", "B")] * 2 + [(None, "A")] * 1
    df = spark.createDataFrame(rows, "country string, seg string")
    out = kanonymity_violations(df, ["country", "seg"], k=3).collect()
    got = {(r["country"], r["seg"]): r["group_size"] for r in out}
    assert got == {("US", "B"): 2, (None, "A"): 1}


def test_kanonymity_rejects_degenerate_k(spark):
    df = spark.createDataFrame([("x",)], "c string")
    with pytest.raises(ValueError):
        kanonymity_violations(df, ["c"], k=1)
