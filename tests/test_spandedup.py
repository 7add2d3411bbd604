"""Unit tests for duplicated-span coverage (operators/spandedup.py)
with hand-computed interval unions."""

from __future__ import annotations

from big_data_tools_spark.operators.spandedup import (
    duplicated_span_coverage,
    position_grams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_fully_covered(spark):
    text = "a b c d e f"  # 6 tokens, k=3 -> grams at pos 0..3
    df = _docs(spark, [(1, text), (2, text)])
    out = {
        r["doc_id"]: (r["covered"], r["n_tok"], r["dup_coverage"])
        for r in duplicated_span_coverage(df, k=3).collect()
    }
    # every position's gram repeats in the other doc -> union covers all
    assert out == {1: (6, 6, 1.0), 2: (6, 6, 1.0)}


def test_partial_overlap_union(spark):
    # shared run "x y z w" (4 tokens) inside otherwise-unique docs:
    # with k=3, duplicated grams are (x y z) and (y z w) -> union of
    # [p, p+3) and [p+1, p+4) = 4 covered tokens in each doc.
    d1 = "a1 b1 x y z w c1 d1"  # shared run at pos 2
    d2 = "e2 x y z w f2 g2 h2"  # shared run at pos 1
    df = _docs(spark, [(1, d1), (2, d2)])
    out = {
        r["doc_id"]: (r["covered"], r["n_tok"])
        for r in duplicated_span_coverage(df, k=3).collect()
    }
    assert out == {1: (4, 8), 2: (4, 8)}


def test_within_doc_repeat_not_flagged(spark):
    # the repeated trigram lives in ONE doc only -> df(gram)=1 -> no dup
    df = _docs(spark, [(1, "p q r p q r"), (2, "s t u v w x")])
    out = {r["doc_id"]: r["covered"] for r in duplicated_span_coverage(df, k=3).collect()}
    assert out == {1: 0, 2: 0}


def test_short_docs_yield_zero_coverage(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b")])  # < k tokens
    out = duplicated_span_coverage(df, k=3).collect()
    assert {r["doc_id"]: (r["covered"], r["dup_coverage"]) for r in out} == {
        1: (0, 0.0),
        2: (0, 0.0),
    }


def test_hot_gram_cap_drops_ubiquitous_spans(spark):
    text = "m n o m2 n2 o2"
    df = _docs(spark, [(i, text) for i in range(1, 5)])
    # df(gram)=4 for every gram; cap at 3 -> everything dropped
    capped = duplicated_span_coverage(df, k=3, max_gram_docs=3)
    assert all(r["covered"] == 0 for r in capped.collect())
    uncapped = duplicated_span_coverage(df, k=3, max_gram_docs=10)
    assert all(r["covered"] == 6 for r in uncapped.collect())


def test_position_grams_positions(spark):
    df = _docs(spark, [(1, "a b c d")])
    rows = position_grams(df, k=3).collect()
    assert sorted(r["pos"] for r in rows) == [0, 1]
    assert all(len(r["gram"]) == 16 for r in rows)
