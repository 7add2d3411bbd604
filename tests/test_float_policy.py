"""Float-policy lint over every registered oracle twin (VERDICT r6 #2).

The two r6 driver hash failures were both float-policy violations the
lint below would have rejected: corpus_heaps_fit fed round(ln(x), 6)
(libm-dependent) into exact decimal sums; ml_features_split rounded a
raw-double sum (add-order dependent). This test keeps both bug classes
out of the registry permanently.
"""

from __future__ import annotations

from big_data_tools_spark.plans.lint import lint_all_twins, lint_twin_sql


def test_no_float_policy_violations_in_registry():
    problems = lint_all_twins()
    assert problems == [], "\n".join(problems)


def test_lint_catches_libm_transcendental():
    # the exact corpus_heaps_fit r6 pattern
    sql = "SELECT round(ln(CAST(n AS DOUBLE)), 6) AS x FROM t"
    problems = lint_twin_sql("demo", sql)
    assert any("libm" in p for p in problems)


def test_lint_catches_raw_double_sum():
    # the exact ml_features_split r6 pattern
    sql = "SELECT round(CAST(sum(o_totalprice) AS DOUBLE), 2) FROM orders"
    problems = lint_twin_sql("demo", sql)
    assert any("raw DOUBLE" in p for p in problems)


def test_lint_accepts_quantized_forms():
    ok = [
        # decimal-cast money sum (functions/agg.py recipe)
        "SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders",
        # integer cents
        "SELECT sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) FROM orders",
        # sqrt is IEEE-correctly-rounded, exempt
        "SELECT round(sqrt(x), 6) FROM t",
        # transcendental mentioned only in a comment
        "SELECT a -- ln(x) explained here\nFROM t",
    ]
    for sql in ok:
        assert lint_twin_sql("demo", sql) == [], sql
