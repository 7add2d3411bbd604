"""Governance/curation operator tests: incremental-state algebra,
bucketed zero-shuffle join plan, canonical dedup determinism, and the
rolling-DAU invariants (round 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.operators.incremental import (
    aggregate_state,
    finish_rollup,
    merge_states,
)
from big_data_tools_spark.plans.lint import count_exchanges, explain_text
from big_data_tools_spark.queries import get

KEYS = ["o_orderstatus", "o_orderpriority"]


def _full_rollup(spark, sf):
    orders = load_table(spark, sf, "orders")
    return finish_rollup(aggregate_state(orders, KEYS, "o_totalprice"), KEYS)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_full_at_any_split(spark, sf_smoke):
    """merge(state(A), state(B)) == state(A ∪ B) for several cutoffs —
    including degenerate splits where one side is empty."""
    orders = load_table(spark, sf_smoke, "orders")
    expected = _rows(_full_rollup(spark, sf_smoke))
    for cutoff in ("1900-01-01", "1995-06-15", "1997-01-01", "2099-01-01"):
        c = F.lit(cutoff).cast("date")
        a = aggregate_state(orders.filter(F.col("o_orderdate").cast("date") < c), KEYS, "o_totalprice")
        b = aggregate_state(orders.filter(F.col("o_orderdate").cast("date") >= c), KEYS, "o_totalprice")
        got = _rows(finish_rollup(merge_states(KEYS, a, b), KEYS))
        assert got == expected, f"cutoff {cutoff}"


def test_merge_is_order_independent_and_nary(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    parts = [
        aggregate_state(orders.filter(F.col("o_orderkey") % 3 == i), KEYS, "o_totalprice")
        for i in range(3)
    ]
    fwd = _rows(finish_rollup(merge_states(KEYS, *parts), KEYS))
    rev = _rows(finish_rollup(merge_states(KEYS, *reversed(parts)), KEYS))
    assert fwd == rev == _rows(_full_rollup(spark, sf_smoke))


def test_merge_states_rejects_non_state_frames(spark, sf_smoke):
    import pytest

    orders = load_table(spark, sf_smoke, "orders")
    with pytest.raises(ValueError, match="missing columns"):
        merge_states(KEYS, orders)
    with pytest.raises(ValueError, match="at least one"):
        merge_states(KEYS)


def test_bucketed_join_has_no_exchange(spark, sf_smoke):
    """The whole point of the bucketed layout: the o_orderkey join and
    scan plan contains ZERO Exchange operators before the final
    aggregate's own shuffle."""
    df = get("bucketed_revenue_join").fn(spark, sf_smoke)
    # one shuffle total: the tiny per-priority aggregate; the join
    # itself must not add any
    assert count_exchanges(df) <= 1
    txt = explain_text(df, "formatted")
    assert "SortMergeJoin" in txt or "ShuffledHashJoin" in txt
    # bucketed scans report their bucket layout
    assert "Bucketed: true" in txt, txt[:2000]


def test_canonical_survivor_rule_quality_then_id(spark):
    """Tie-breaks on a corpus built to exercise them: normalization
    collapses case/whitespace, survivor = (max quality, then min id)."""
    from big_data_tools_spark.operators.dedup import canonical_survivors

    rows = [
        (1, "alpha beta", 10),
        (2, "ALPHA   beta", 30),   # same group after normalization
        (3, "alpha beta ", 30),    # quality tie with 2 -> lower id wins
        (4, "gamma", 7),           # singleton keeps itself
        (5, "delta", 5),
        (6, "delta", 5),           # full tie -> id 5 wins
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "q"])
    got = {
        r["fingerprint"]: r
        for r in canonical_survivors(df, "text", "doc_id", "q").collect()
    }
    assert len(got) == 3
    by_keep = {r["keep_doc_id"]: r for r in got.values()}
    assert by_keep[2]["group_size"] == 3 and by_keep[2]["keep_q"] == 30
    assert by_keep[4]["group_size"] == 1
    assert by_keep[5]["group_size"] == 2
    assert 6 not in by_keep and 1 not in by_keep and 3 not in by_keep


def test_canonical_docs_cover_every_group(spark, sf_smoke):
    from big_data_tools_spark.operators.text import fingerprint

    docs = load_table(spark, sf_smoke, "documents")
    out = get("dedup_canonical_docs").fn(spark, sf_smoke)
    n_groups = docs.select(fingerprint(F.col("text"))).distinct().count()
    survivors = out.collect()
    assert len(survivors) == n_groups
    assert sum(r["group_size"] for r in survivors) == docs.count()


def test_cluster_spectrum_accounts_for_every_doc(spark, sf_smoke):
    docs_total = load_table(spark, sf_smoke, "documents").count()
    spec = get("dedup_cluster_size_spectrum").fn(spark, sf_smoke).collect()
    assert sum(r["n_docs"] for r in spec) == docs_total
    for r in spec:
        assert r["n_docs"] == r["copies"] * r["n_groups"]


def test_rolling_dau_invariants(spark, sf_smoke):
    rows = {r["day"]: r for r in get("events_rolling_dau").fn(spark, sf_smoke).collect()}
    assert rows
    days = sorted(rows)
    for d in days:
        window = [rows[x] for x in days if 0 <= (d - x).days <= 6]
        lo = max(r["dau"] for r in window)
        hi = sum(r["dau"] for r in window)
        assert lo <= rows[d]["dau_7d"] <= hi, d


def test_gdpr_cascade_counts_are_consistent(spark, sf_smoke):
    row = get("gdpr_erasure_cascade").fn(spark, sf_smoke).collect()[0]
    assert 0 < row["customers_erased"] < row["customers_total"]
    assert row["orders_erased"] <= row["orders_total"]
    assert row["lineitems_erased"] <= row["lineitems_total"]
    # erasing customers with no orders is legal, but at smoke scale the
    # AUTOMOBILE/negative-balance cohort must cascade somewhere
    assert row["orders_erased"] > 0 and row["lineitems_erased"] > 0


def test_skipgram_plan_is_single_shuffle(spark, sf_smoke):
    """Pair generation is pure array slicing: the only Exchange in the
    plan is the pair-count aggregate (TakeOrdered adds none)."""
    df = get("token_skipgram_counts").fn(spark, sf_smoke)
    assert count_exchanges(df) <= 2  # partial/final agg pair at most
    assert "Join" not in explain_text(df, "formatted")


def test_histogram_state_merge_is_exact_and_quantile_bounded(spark, sf_oracle):
    """Fixed-grid histogram states: any split of the table merges to
    the FULL-table state bit-for-bit (vector addition, no sketch
    loss), merge order never matters, and the derived quantile sits
    within one bin width of the exact percentile."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.incremental import (
        histogram_quantile,
        histogram_state,
        merge_histogram_states,
    )

    o = load_table(spark, sf_oracle, "orders")
    keys, lo, hi, nb = ["o_orderpriority"], 0.0, 400000.0, 64
    full = {
        r["o_orderpriority"]: r["bins"]
        for r in histogram_state(o, keys, "o_totalprice", lo, hi, nb).collect()
    }
    parts = [
        histogram_state(
            o.filter(F.col("o_orderkey") % 3 == i), keys, "o_totalprice", lo, hi, nb
        )
        for i in range(3)
    ]
    merged = {
        r["o_orderpriority"]: r["bins"]
        for r in merge_histogram_states(keys, *parts).collect()
    }
    assert merged == full
    reordered = {
        r["o_orderpriority"]: r["bins"]
        for r in merge_histogram_states(keys, parts[2], parts[0], parts[1]).collect()
    }
    assert reordered == full

    q50 = {
        r["o_orderpriority"]: r["q50_approx"]
        for r in histogram_quantile(
            histogram_state(o, keys, "o_totalprice", lo, hi, nb), keys, 0.5, lo, hi
        ).collect()
    }
    exact = {
        r["o_orderpriority"]: r["p"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("p"))
        .collect()
    }
    width = (hi - lo) / nb
    for k, p in exact.items():
        assert abs(q50[k] - p) <= width, (k, q50[k], p)


def test_histogram_state_clamps_out_of_range_mass(spark):
    """Values past the declared range land in the edge bins — the
    state never silently drops drifted data."""
    from big_data_tools_spark.operators.incremental import histogram_state

    df = spark.createDataFrame(
        [("k", -100.0), ("k", 5.0), ("k", 999.0)], "g string, v double"
    )
    bins = histogram_state(df, ["g"], "v", 0.0, 10.0, 4).collect()[0]["bins"]
    assert len(bins) == 4
    assert bins[0] == 1  # -100 clamps into bin 0
    assert bins[2] == 1  # 5.0 -> bin 2
    assert bins[3] == 1  # 999 clamps into the top bin
    assert sum(bins) == 3
