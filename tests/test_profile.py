"""Single-pass profiling (operators/profile.py)."""

from __future__ import annotations

from big_data_tools_spark.operators.profile import profile_table


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, "a", None),
            (2, "a", 1.5),
            (3, "b", 1.5),
            (None, None, 2.5),
        ],
        ["k", "s", "v"],
    )


def test_exact_profile(spark):
    out = {r["column_name"]: r for r in profile_table(_fixture(spark)).collect()}
    assert out["k"]["n_nulls"] == 1 and out["k"]["n_distinct"] == 3
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 2


def test_approx_profile_close_and_single_pass(spark):
    df = _fixture(spark)
    out = {
        r["column_name"]: r for r in profile_table(df, approx=True).collect()
    }
    # HLL++ is exact at these cardinalities
    assert out["k"]["n_distinct"] == 3
    assert out["s"]["n_distinct"] == 2
    # the 100 TB property: approx mode must not plan an Expand
    plan = profile_table(df, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_column_subset(spark):
    out = profile_table(_fixture(spark), columns=["k"]).collect()
    assert [r["column_name"] for r in out] == ["k"]
