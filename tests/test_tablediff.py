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


def test_diff_tables_cli(spark, sf_smoke, tmp_path):
    """tools/diff_tables.py end to end: deletions and updates triaged
    with exact counts in the JSON summary."""
    import json
    import os
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from big_data_tools_spark.io.sources import load_table

    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    o = load_table(spark, sf_smoke, "orders")
    o.write.parquet(old_p)
    (
        o.filter(F.col("o_orderkey") % 10 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
        .write.parquet(new_p)
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable, "tools/diff_tables.py", old_p, new_p,
            "--keys", "o_orderkey", "--compare", "o_totalprice,o_orderstatus",
        ],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    s = json.loads(proc.stdout.strip().splitlines()[-1])
    n = o.count()
    assert s["n_deleted"] == o.filter(F.col("o_orderkey") % 10 == 0).count()
    assert s["n_updated"] == o.filter(
        (F.col("o_orderkey") % 10 != 0) & (F.col("o_orderkey") % 7 == 0)
    ).count()
    assert s["n_inserted"] == 0
    assert s["n_changed_o_orderstatus"] == 0
    assert s["n_changed_o_totalprice"] == s["n_updated"]


def test_diff_summary_identical_snapshots_is_all_zeros(spark):
    """Identical snapshots produce an EMPTY diff; the summary must
    report integer zeros, not NULL sums (the deploy-gate's most
    common outcome — "nothing changed" — printed as null reads as a
    broken gate; r9 CLI smoke finding)."""
    from big_data_tools_spark.operators.tablediff import diff_summary, snapshot_diff

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["k", "s", "v"]
    )
    diff = snapshot_diff(df, df, ["k"], ["s", "v"])
    row = diff_summary(diff, ["s", "v"]).first()
    assert row.n_inserted == 0
    assert row.n_deleted == 0
    assert row.n_updated == 0
    assert row.n_changed_s == 0
    assert row.n_changed_v == 0
