"""Skew stress fixture (operators/skew.py with_boilerplate_hotband):
the hot-band salted path must engage on the boilerplate corpus and
produce EXACTLY the unsalted candidate/pair set — salting balances
work, never changes results."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.operators.dedup import minhash_band_pairs
from big_data_tools_spark.operators.skew import with_boilerplate_hotband


def _pairs(df):
    return sorted((r["id_a"], r["id_b"]) for r in df.collect())


def test_hotband_fixture_creates_real_skew(spark, sf_smoke):
    docs = with_boilerplate_hotband(
        load_table(spark, sf_smoke, "documents"), every_n=5
    )
    n_hot = docs.filter(F.col("doc_id") % 5 == 0).count()
    assert n_hot >= 10
    # the boilerplate docs share their text except the tail -> they
    # must all surface as near-dup pairs: at least one band carries
    # every hot doc, i.e. the skew is real
    pairs = minhash_band_pairs(docs, "text", "doc_id", hot_band_threshold=1 << 62)
    hot_ids = {r["doc_id"] for r in docs.filter(F.col("doc_id") % 5 == 0).collect()}
    paired_hot = {i for p in _pairs(pairs) for i in p if i in hot_ids}
    assert len(paired_hot) == len(hot_ids)


def test_salted_equals_unsalted_under_skew(spark, sf_smoke):
    docs = with_boilerplate_hotband(
        load_table(spark, sf_smoke, "documents"), every_n=5
    )
    # hot_threshold below the boilerplate group size forces the salted
    # plan for every boilerplate band; the giant threshold disables it
    salted = minhash_band_pairs(
        docs, "text", "doc_id", hot_band_threshold=8, salt_buckets=4
    )
    unsalted = minhash_band_pairs(docs, "text", "doc_id", hot_band_threshold=1 << 62)
    assert _pairs(salted) == _pairs(unsalted) != []
