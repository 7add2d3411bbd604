"""Committed parquet Yelp fixtures (fixtures/yelp/) must stay in sync
with the in-memory fixture generator — the yelp_basetable_mini oracle
reads the parquet while tests/test_yelp_pipeline.py pins the in-memory
form, so silent drift would let the two verdicts diverge. Regenerate
with tools/write_yelp_fixtures.py when pipeline/fixtures.py changes."""

from __future__ import annotations

from pathlib import Path

import pytest

from big_data_tools_spark.pipeline.fixtures import yelp_tables

FIXDIR = Path(__file__).resolve().parent.parent / "fixtures" / "yelp"


def test_parquet_fixtures_match_inmemory(spark):
    mem = yelp_tables(spark)
    for name, df in mem.items():
        path = FIXDIR / f"{name}.parquet"
        assert path.exists(), f"missing {path}; run tools/write_yelp_fixtures.py"
        disk = spark.read.parquet(str(path))
        assert disk.schema == df.schema, name
        want = sorted(map(str, df.collect()))
        got = sorted(map(str, disk.collect()))
        assert got == want, f"{name} drifted; run tools/write_yelp_fixtures.py"


def test_mini_basetable_matches_inmemory_pipeline(spark):
    """The parquet-backed mini query must agree with the in-memory
    pipeline on the overlapping columns — same pipeline, same rows."""
    from big_data_tools_spark.pipeline.yelp import build_basetable
    from big_data_tools_spark.queries.registry import get

    mini = get("yelp_basetable_mini").fn(spark, "unused_sf_dir")
    t = yelp_tables(spark)
    full = build_basetable(
        t["business"], t["review"], t["checkin"], t["tip"], t["user"], t["covid"]
    )
    mini_rows = {r["business_id"]: r for r in mini.collect()}
    full_rows = {r["business_id"]: r for r in full.collect()}
    assert set(mini_rows) == set(full_rows)
    for bid, fr in full_rows.items():
        mr = mini_rows[bid]
        assert mr["label"] == fr["label"]
        assert mr["wifi"] == fr["attributes_WiFi"]
        assert mr["weekly_hours_open"] == fr["weekly_hours_open"]
        assert mr["n_reviews"] == fr["n_reviews"]
        assert mr["avg_adjusted_rating"] == pytest.approx(
            round(fr["avg_adjusted_rating"], 3)
        )
        assert mr["min_checkin_recency"] == fr["min_checkin_recency"]
