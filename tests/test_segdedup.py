"""Segment-level dedup (operators/segdedup.py): exact removal +
reassembly semantics on literal documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_tools_spark.operators.segdedup import segment_dedup, segment_spans


BOILER = "cookie notice please accept"  # 4 tokens -> one full segment at seg=4
UNIQ_A = "alpha beta gamma delta"
UNIQ_B = "epsilon zeta eta theta"


def test_removes_shared_segment_and_reassembles(spark):
    df = spark.createDataFrame(
        [
            (1, f"{BOILER} {UNIQ_A}"),
            (2, f"{BOILER} {UNIQ_B}"),
            (3, "pad " + UNIQ_A + " " + UNIQ_B),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in segment_dedup(df, "text", "doc_id", seg_tokens=4, min_docs=2).collect()
    }
    # the boilerplate head segment appears in docs 1+2 -> removed there
    assert out[1]["n_seg"] == 2 and out[1]["n_removed"] == 1
    assert out[1]["cleaned_text"] == UNIQ_A
    assert out[2]["n_seg"] == 2 and out[2]["n_removed"] == 1
    assert out[2]["cleaned_text"] == UNIQ_B
    # doc 3 reuses the same tokens but its leading pad misaligns every
    # segment boundary -> no segment matches, text intact
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"] == ("pad " + UNIQ_A + " " + UNIQ_B).lower()


def test_order_preserved_across_many_segments(spark):
    # 12 tokens, seg=2 -> 6 segments; remove the shared middle one only
    shared = "xx yy"
    text1 = f"a1 a2 a3 a4 {shared} a5 a6 a7 a8 a9 a10"
    text2 = f"b1 b2 b3 b4 {shared} b5 b6 b7 b8 b9 b10"
    df = spark.createDataFrame([(1, text1), (2, text2)], ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in segment_dedup(df, "text", "doc_id", seg_tokens=2, min_docs=2).collect()
    }
    assert out[1]["cleaned_text"] == "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    assert out[2]["cleaned_text"] == "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"


def test_no_duplicates_is_identity(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five"), (2, "six seven eight nine ten")],
        ["doc_id", "text"],
    )
    out = segment_dedup(df, "text", "doc_id", seg_tokens=3, min_docs=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    for i, original in ((1, "one two three four five"), (2, "six seven eight nine ten")):
        assert rows[i]["n_removed"] == 0
        assert rows[i]["cleaned_text"] == original


def test_segment_spans_shapes(spark):
    df = spark.createDataFrame([("a b c d e",), ("solo",)], ["text"])
    spans = df.select(segment_spans(F.col("text"), 2).alias("s")).collect()
    assert [(x["seg_idx"], x["seg"]) for x in spans[0]["s"]] == [
        (0, "a b"),
        (1, "c d"),
        (2, "e"),
    ]
    # single short doc -> exactly one segment, never a descending sequence
    assert [(x["seg_idx"], x["seg"]) for x in spans[1]["s"]] == [(0, "solo")]
