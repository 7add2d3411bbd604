"""Property-based tests (hypothesis) for the round-4 operators whose
correctness reduces to a pure-Python reference model: mergeable
aggregate states (any partition of the rows merges to the full-table
state) and canonical-survivor selection (max quality, min id)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

KEYS = ["k"]

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),                      # group key
        st.integers(-10_000, 10_000),           # value in cents
        st.integers(0, 2),                      # partition assignment
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=20, deadline=None)
@given(rows_strategy)
def test_merged_states_equal_full_state_for_any_partition(spark, rows):
    from pyspark.sql import functions as F

    from big_data_tools_spark.operators.incremental import (
        aggregate_state,
        finish_rollup,
        merge_states,
    )

    df = spark.createDataFrame(
        [(k, v / 100.0, p) for k, v, p in rows], "k int, v double, p int"
    ).persist()
    full = finish_rollup(aggregate_state(df, KEYS, "v"), KEYS)
    parts = [
        aggregate_state(df.filter(F.col("p") == i), KEYS, "v") for i in range(3)
    ]
    merged = finish_rollup(merge_states(KEYS, *parts), KEYS)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    df.unpersist()


docs_strategy = st.lists(
    st.tuples(
        st.integers(0, 30),          # doc id (dupes dropped below)
        st.sampled_from(["a b", "a  B ", "c", "d e f", " C"]),  # text
        st.integers(0, 5),           # quality
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=20, deadline=None)
@given(docs_strategy)
def test_canonical_survivors_match_python_model(spark, docs):
    import re

    from big_data_tools_spark.operators.dedup import canonical_survivors

    uniq = {d_id: (t, q) for d_id, t, q in docs}
    rows = [(d_id, t, q) for d_id, (t, q) in uniq.items()]
    df = spark.createDataFrame(rows, "doc_id int, text string, q int")
    got = {
        r["fingerprint"]: (r["keep_doc_id"], r["keep_q"], r["group_size"])
        for r in canonical_survivors(df, "text", "doc_id", "q").collect()
    }

    groups: dict[str, list] = {}
    for d_id, t, q in rows:
        norm = re.sub(r"\s+", " ", t.strip().lower())
        groups.setdefault(norm, []).append((q, d_id))
    assert len(got) == len(groups)
    by_size = sorted((len(m), max(m, key=lambda t: (t[0], -t[1]))) for m in groups.values())
    got_sorted = sorted((gs, (q, d)) for d, q, gs in got.values())
    assert got_sorted == by_size


@settings(max_examples=15, deadline=None)
@given(rows_strategy)
def test_histogram_states_merge_to_full_for_any_partition(spark, rows):
    """Fixed-grid histogram states are an exact monoid: any partition
    of the rows merges to the full-table bin vector bit-for-bit,
    including values outside the declared range (clamped mass)."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.operators.incremental import (
        histogram_state,
        merge_histogram_states,
    )

    df = spark.createDataFrame(
        [(k, v / 100.0, p) for k, v, p in rows], "k int, v double, p int"
    ).persist()
    lo, hi, nb = -50.0, 50.0, 16  # narrower than data -> clamping exercised
    full = {
        r["k"]: r["bins"]
        for r in histogram_state(df, KEYS, "v", lo, hi, nb).collect()
    }
    parts = [
        histogram_state(df.filter(F.col("p") == i), KEYS, "v", lo, hi, nb)
        for i in range(3)
    ]
    nonempty = [s for s in parts if s.first() is not None]
    merged = {
        r["k"]: r["bins"]
        for r in merge_histogram_states(KEYS, *nonempty).collect()
    }
    df.unpersist()
    assert merged == full
    for bins in full.values():
        assert len(bins) == nb


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(-10_000, 10_000), min_size=2, max_size=24)
)
def test_holt_fold_matches_python_on_random_series(spark, ys):
    """The F.aggregate Holt fold must replay the sequential recurrence
    exactly for arbitrary series (the fold is the recurrence)."""
    import datetime

    from pyspark.sql import functions as F

    from big_data_tools_spark.queries.analytics import _HOLT_ALPHA, _HOLT_BETA

    series = [
        (datetime.date(2020, 1, 1) + datetime.timedelta(days=30 * i), y / 100.0)
        for i, y in enumerate(ys)
    ]
    df = spark.createDataFrame(series, "month date, y double")
    agged = df.agg(F.array_sort(F.collect_list(F.struct("month", "y"))).alias("s"))
    a, b = _HOLT_ALPHA, _HOLT_BETA
    first = F.element_at(F.col("s"), 1)["y"]
    second = F.element_at(F.col("s"), 2)["y"]
    init = F.struct(first.alias("l"), (second - first).alias("b"))
    rest = F.slice(F.col("s"), 2, F.greatest(F.size("s") - 1, F.lit(0)))
    folded = agged.select(
        F.aggregate(
            rest,
            init,
            lambda acc, x: F.struct(
                (F.lit(a) * x["y"] + F.lit(1 - a) * (acc["l"] + acc["b"])).alias("l"),
                (
                    F.lit(b)
                    * (
                        F.lit(a) * x["y"]
                        + F.lit(1 - a) * (acc["l"] + acc["b"])
                        - acc["l"]
                    )
                    + F.lit(1 - b) * acc["b"]
                ).alias("b"),
            ),
        ).alias("st")
    ).first()["st"]
    l, t = series[0][1], series[1][1] - series[0][1]
    for _, y in series[1:]:
        nl = a * y + (1 - a) * (l + t)
        nt = b * (nl - l) + (1 - b) * t
        l, t = nl, nt
    assert abs(folded["l"] - l) < 1e-9
    assert abs(folded["b"] - t) < 1e-9
