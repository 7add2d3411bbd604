"""Unit tests for the keyed snapshot diff (operators/tablediff.py)."""

from __future__ import annotations

import pytest

from big_data_tools_spark.operators.tablediff import diff_summary, snapshot_diff


def _frames(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged
            (2, "b", 20.0),   # value change
            (3, "c", 30.0),   # deleted
            (4, None, 40.0),  # null -> value change
            (5, "e", None),   # stays null (unchanged, null-safe)
        ],
        "id long, status string, amount double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 25.0),
            (4, "d", 40.0),
            (5, "e", None),
            (6, "f", 60.0),   # inserted
        ],
        "id long, status string, amount double",
    )
    return old, new


def test_diff_classifies_and_lists_changed_cols(spark):
    old, new = _frames(spark)
    rows = {
        r["id"]: (r["change_type"], list(r["changed_cols"]))
        for r in snapshot_diff(old, new, keys=["id"]).collect()
    }
    assert rows == {
        2: ("U", ["amount"]),
        3: ("D", []),
        4: ("U", ["status"]),
        6: ("I", []),
    }
    # 1 and 5 are unchanged (5 null-safely) and must NOT appear
    assert 1 not in rows and 5 not in rows


def test_diff_carries_new_side_values(spark):
    old, new = _frames(spark)
    got = {
        r["id"]: (r["status"], r["amount"])
        for r in snapshot_diff(old, new, keys=["id"]).collect()
    }
    assert got[2] == ("b", 25.0)
    assert got[6] == ("f", 60.0)
    assert got[3] == (None, None)  # deleted rows have no new side


def test_diff_summary_counts(spark):
    old, new = _frames(spark)
    d = snapshot_diff(old, new, keys=["id"])
    row = diff_summary(d, ["status", "amount"]).collect()[0]
    assert (row["n_inserted"], row["n_deleted"], row["n_updated"]) == (1, 1, 2)
    assert row["n_changed_status"] == 1
    assert row["n_changed_amount"] == 1


def test_diff_validates_inputs(spark):
    old, new = _frames(spark)
    with pytest.raises(ValueError):
        snapshot_diff(old, new, keys=[])
    with pytest.raises(ValueError):
        snapshot_diff(old, new, keys=["id"], compare_cols=["nope"])
