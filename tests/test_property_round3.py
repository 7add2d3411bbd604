"""Property-based tests (hypothesis) for the round-3 operators whose
correctness reduces to a small pure-Python reference model: CDC
latest-change-wins, interval-union span coverage, and snapshot diff.
Each property runs the Spark operator against arbitrary generated
inputs and compares with the obvious in-memory implementation."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


# ----------------------------------------------------------------- CDC

change_feeds = st.lists(
    st.tuples(
        st.integers(0, 4),            # key
        st.sampled_from(["I", "U", "D"]),
        st.integers(-100, 100),       # payload
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=25, deadline=None)
@given(change_feeds)
def test_apply_changes_matches_python_model(spark, feed):
    from big_data_tools_spark.operators.cdc import apply_changes

    rows = [(k, i, op, float(v)) for i, (k, op, v) in enumerate(feed)]
    df = spark.createDataFrame(rows, "key int, seq int, op string, v double")
    got = {
        r["key"]: (r["seq"], r["op"], r["v"])
        for r in apply_changes(df, keys=["key"], sequence_cols=["seq"]).collect()
    }

    latest: dict[int, tuple] = {}
    for k, i, op, v in rows:
        if k not in latest or i > latest[k][0]:
            latest[k] = (i, op, v)
    want = {k: t for k, t in latest.items() if t[1] != "D"}
    assert got == want


# ------------------------------------------------- span interval union

docs_strategy = st.lists(
    st.tuples(
        st.integers(1, 6),  # doc id
        st.lists(st.sampled_from(list("abcd")), min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)


@settings(max_examples=20, deadline=None)
@given(docs_strategy, st.integers(2, 4))
def test_span_coverage_matches_python_model(spark, docs, k):
    from big_data_tools_spark.operators.spandedup import duplicated_span_coverage

    rows = [(i, " ".join(toks)) for i, toks in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["covered"], r["n_tok"])
        for r in duplicated_span_coverage(df, k=k).collect()
    }

    # python model: k-grams per doc, dup grams across >=2 docs,
    # union of covered positions
    def toks_of(text):
        return text.lower().split(" ")

    grams: dict[int, list[tuple[int, tuple]]] = {}
    for i, text in rows:
        t = toks_of(text)
        grams[i] = [
            (p, tuple(t[p : p + k])) for p in range(max(0, len(t) - k + 1))
        ] if len(t) >= k else []
    from collections import defaultdict

    docs_per_gram = defaultdict(set)
    for i, gs in grams.items():
        for _, g in gs:
            docs_per_gram[g].add(i)
    want = {}
    for i, text in rows:
        covered = set()
        for p, g in grams[i]:
            if len(docs_per_gram[g]) >= 2:
                covered.update(range(p, p + k))
        want[i] = (len(covered), len(toks_of(text)))
    assert got == want


# ------------------------------------------------------- snapshot diff

snapshots = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 3)),
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(max_examples=25, deadline=None)
@given(snapshots, snapshots)
def test_snapshot_diff_matches_python_model(spark, old_rows, new_rows):
    from big_data_tools_spark.operators.tablediff import snapshot_diff

    old = spark.createDataFrame(old_rows or [(99, 0)], "id int, v int")
    new = spark.createDataFrame(new_rows or [(98, 0)], "id int, v int")
    o = dict(old_rows or [(99, 0)])
    n = dict(new_rows or [(98, 0)])

    got = {
        r["id"]: (r["change_type"], list(r["changed_cols"]))
        for r in snapshot_diff(old, new, keys=["id"]).collect()
    }
    want = {}
    for k in o.keys() | n.keys():
        if k not in n:
            want[k] = ("D", [])
        elif k not in o:
            want[k] = ("I", [])
        elif o[k] != n[k]:
            want[k] = ("U", ["v"])
    assert got == want
