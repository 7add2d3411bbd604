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
