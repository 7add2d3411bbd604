"""Plant-a-gap coverage for the ingestion-completeness report (r4
VERDICT blemish #1): at sf0.01 the events table has no gaps, so the
driver's green row used to be a vacuous 0-row == 0-row match. These
fixtures force each branch — a fully-missing day, a sparse day, and
the no-gap summary row — so the spine logic carries real signal.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest

from big_data_tools_spark.queries import get


def _write_events(spark, rows):
    """rows: list of (event_id, ts) — fill the remaining events
    columns with constants so load_table's schema handling applies."""
    d = tempfile.mkdtemp(prefix="bdt_gapfix_")
    df = spark.createDataFrame(
        [(i, ts, 1, "click", 1.0, "{}") for i, ts in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def _day(d: int) -> dt.datetime:
    return dt.datetime(2024, 3, d, 12, 0, 0)


@pytest.fixture(scope="module")
def completeness():
    return get("events_daily_completeness").fn


def test_missing_and_sparse_days_surface(spark, completeness):
    # day 1: 12 events (ok), day 2: absent (missing), day 3: 2 events
    # (sparse, threshold is 10), day 4: 12 events (ok)
    rows = [(i, _day(1)) for i in range(12)]
    rows += [(100 + i, _day(3)) for i in range(2)]
    rows += [(200 + i, _day(4)) for i in range(12)]
    d = _write_events(spark, rows)
    try:
        got = {r["day"]: (r["n_events"], r["status"]) for r in completeness(spark, d).collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == {
        dt.date(2024, 3, 2): (0, "missing"),
        dt.date(2024, 3, 3): (2, "sparse"),
    }


def test_source_overlap_matrix_counts_planted_duplicates(spark):
    """Same vacuous-green audit as the completeness report: at sf0.01
    there are no cross-source duplicates, so pin the overlap COUNT
    path on a fixture with planted dupes — and the zero-overlap pairs
    must still appear explicitly (never-empty matrix contract)."""
    rows = [
        (1, "shared document body one", "web", 24),
        (2, "shared document body one", "books", 24),  # dup across web/books
        (3, "shared document body two", "web", 24),
        (4, "shared document body two", "books", 24),  # second shared fp
        (5, "only in web", "web", 11),
        (6, "only in wiki", "wiki", 12),
    ]
    d = tempfile.mkdtemp(prefix="bdt_overlap_")
    spark.createDataFrame(
        [(i, t, "en", s, n) for i, t, s, n in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    try:
        got = {
            (r["source_a"], r["source_b"]): r["shared_fingerprints"]
            for r in get("source_overlap_matrix").fn(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == {
        ("books", "web"): 2,
        ("books", "wiki"): 0,
        ("web", "wiki"): 0,
    }


def test_no_gaps_emits_single_all_ok_row(spark, completeness):
    # three contiguous dense days -> never-empty summary row
    rows = [(d * 100 + i, _day(d)) for d in (1, 2, 3) for i in range(12)]
    d = _write_events(spark, rows)
    try:
        out = completeness(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert len(out) == 1
    r = out[0]
    assert r["day"] is None
    assert r["status"] == "all_ok"
    assert r["n_events"] == 3  # days covered by the gap-free spine
