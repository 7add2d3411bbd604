"""Unit tests for the CDC apply-changes operator (operators/cdc.py)."""

from __future__ import annotations

import pytest

from big_data_tools_spark.operators.cdc import (
    apply_changes,
    change_counts,
    op_from_event_type,
)


def _feed(spark):
    # key, seq, op, payload — hand-built change feed:
    #   k1: I then two U's -> survives with seq 4's payload
    #   k2: I then D       -> deleted
    #   k3: D then I (out-of-order delete first) -> latest is I, survives
    #   k4: single I       -> survives
    rows = [
        ("k1", 1, "I", 10.0),
        ("k1", 3, "U", 11.0),
        ("k1", 4, "U", 12.0),
        ("k2", 2, "I", 20.0),
        ("k2", 5, "D", 0.0),
        ("k3", 6, "D", 0.0),
        ("k3", 7, "I", 30.0),
        ("k4", 8, "I", 40.0),
    ]
    return spark.createDataFrame(rows, "key string, seq int, op string, v double")


def test_latest_change_wins_and_deletes_drop(spark):
    out = apply_changes(_feed(spark), keys=["key"], sequence_cols=["seq"])
    state = {r["key"]: (r["seq"], r["op"], r["v"]) for r in out.collect()}
    assert state == {
        "k1": (4, "U", 12.0),
        "k3": (7, "I", 30.0),
        "k4": (8, "I", 40.0),
    }


def test_multi_column_sequence_tiebreak(spark):
    rows = [
        ("k1", 1, 0, "U", 1.0),
        ("k1", 1, 1, "U", 2.0),  # same seq, higher sub-seq wins
    ]
    df = spark.createDataFrame(rows, "key string, seq int, sub int, op string, v double")
    out = apply_changes(df, keys=["key"], sequence_cols=["seq", "sub"])
    assert [(r["v"]) for r in out.collect()] == [2.0]


def test_empty_keys_rejected(spark):
    with pytest.raises(ValueError):
        apply_changes(_feed(spark), keys=[], sequence_cols=["seq"])
    with pytest.raises(ValueError):
        apply_changes(_feed(spark), keys=["key"], sequence_cols=[])


def test_change_counts_declared_ops(spark):
    out = change_counts(_feed(spark), keys=["key"], ops=("I", "U", "D"))
    rows = {r["key"]: (r["n_I"], r["n_U"], r["n_D"]) for r in out.collect()}
    assert rows == {
        "k1": (1, 2, 0),
        "k2": (1, 0, 1),
        "k3": (1, 0, 1),
        "k4": (1, 0, 0),
    }


def test_op_mapping(spark):
    df = spark.createDataFrame(
        [("signup",), ("click",), ("view",), ("purchase",), ("error",)],
        "event_type string",
    )
    from pyspark.sql import functions as F

    got = {
        r["event_type"]: r["op"]
        for r in df.select(
            "event_type", op_from_event_type(F.col("event_type")).alias("op")
        ).collect()
    }
    assert got == {
        "signup": "I",
        "click": "U",
        "view": "U",
        "purchase": "U",
        "error": "D",
    }
