"""Point-in-time join (operators/pitjoin.py): version selection and
grain preservation."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from big_data_tools_spark.operators.pitjoin import point_in_time_join


def _history(spark):
    # key 1: version A [2020-01-01, 2020-06-01), version B [2020-06-01, null)
    # key 2: single open version
    rows = [
        (1, "A", datetime.date(2020, 1, 1), datetime.date(2020, 6, 1)),
        (1, "B", datetime.date(2020, 6, 1), None),
        (2, "C", datetime.date(2020, 1, 1), None),
    ]
    return spark.createDataFrame(
        rows, "k long, attr string, valid_from date, valid_to date"
    )


def _facts(spark):
    rows = [
        (100, 1, datetime.date(2020, 3, 1)),   # inside version A
        (101, 1, datetime.date(2020, 6, 1)),   # boundary -> version B (from inclusive)
        (102, 1, datetime.date(2021, 1, 1)),   # open version B
        (103, 1, datetime.date(2019, 1, 1)),   # before history -> no match
        (104, 2, datetime.date(2020, 2, 2)),   # key 2
        (105, 3, datetime.date(2020, 2, 2)),   # unknown key -> no match
    ]
    return spark.createDataFrame(rows, "fact_id long, fk long, ts date")


def test_pit_selects_the_version_valid_at_fact_time(spark):
    out = point_in_time_join(
        _facts(spark), _history(spark), "fk", "k", F.col("ts")
    )
    got = {r["fact_id"]: r["attr"] for r in out.collect()}
    assert got == {100: "A", 101: "B", 102: "B", 104: "C"}


def test_pit_preserves_fact_grain(spark):
    """Disjoint validity intervals -> exactly one version per matched
    fact; the join must never duplicate facts."""
    out = point_in_time_join(
        _facts(spark), _history(spark), "fk", "k", F.col("ts")
    )
    ids = [r["fact_id"] for r in out.collect()]
    assert len(ids) == len(set(ids))


def test_pit_left_outer_keeps_unmatched_facts(spark):
    out = point_in_time_join(
        _facts(spark), _history(spark), "fk", "k", F.col("ts"), how="left_outer"
    )
    got = {r["fact_id"]: r["attr"] for r in out.collect()}
    assert got[103] is None and got[105] is None
    assert len(got) == 6


def test_pit_rejects_unknown_join_type(spark):
    with pytest.raises(ValueError):
        point_in_time_join(
            _facts(spark), _history(spark), "fk", "k", F.col("ts"), how="full"
        )
