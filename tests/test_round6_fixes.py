"""Round-6 regression tests for the ADVICE.md findings: timestamp-tie
truncation in Markov/Shapley attribution (a non-purchase event tied
with the first purchase's timestamp must not leak '(conv)' into the
transition srcs, nor count as a touched-before-conversion channel
unless it sorts earlier under the (ts, event_id) total order), the
bootstrap CI's nearest-rank indices on segments small enough to lose
zero-weight replicates, and the Theil-Sen integer micro-unit median.

Each fixture also runs the registered DuckDB oracle twin on the SAME
planted parquet and compares rowsets — the parity sweep runs on the
sf corpora, which contain none of these edge shapes, so engine
divergence on them is only caught here.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

import duckdb
import pytest

from big_data_tools_spark.queries import get

from .oracle import rowset


def _plant(spark, tables: dict[str, tuple[list, str]]) -> str:
    d = tempfile.mkdtemp(prefix="bdt_r6fix_")
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{name}.parquet")
    return d


def _oracle_rows(sql: str, d: str, tables: list[str]):
    con = duckdb.connect()
    for name in tables:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{d}/{name}.parquet/*.parquet')"
        )
    cur = con.execute(sql)
    cols = [c[0] for c in cur.description]
    return cols, [tuple(r) for r in cur.fetchall()]


def _assert_engine_parity(spark, name: str, d: str, tables: list[str]):
    spec = get(name)
    sdf = spec.fn(spark, d)
    scols, srows = list(sdf.columns), [tuple(r) for r in sdf.collect()]
    dcols, drows = _oracle_rows(spec.sql, d, tables)
    assert sorted(scols) == sorted(dcols)
    assert rowset(scols, srows) == rowset(dcols, drows)
    return {r[scols.index(scols[0])]: dict(zip(scols, r)) for r in srows}


_EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ts(m: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m)


def test_markov_tie_truncation_and_conv_never_holds_mass(spark):
    """Four journeys with both tie polarities at the conversion:
    u1 click->purchase; u2 purchase then view at the SAME ts (view has
    the larger event_id, so it falls after the cut — journey is a bare
    (start)->(conv)); u3 view then purchase at the same ts (view has
    the smaller event_id, so it survives); u4 click, no conversion.

    Exact chain: start -> {click 1/2, (conv) 1/4, view 1/4},
    click -> {(conv) 1/2, (null) 1/2}, view -> (conv). P(conv) = 3/4;
    removing either channel drops it to 1/2 -> removal effects 1/3,
    shares 1/2. Under the old ts <= conv_ts cut, u2's trailing view
    made '(conv)' a transition src: a bogus '(conv)' channel row, and
    the engines diverged on the remaining shares."""
    rows = [
        (11, _ts(1), 1, "click"),
        (12, _ts(2), 1, "purchase"),
        (21, _ts(5), 2, "purchase"),
        (22, _ts(5), 2, "view"),  # tied, sorts AFTER the purchase
        (31, _ts(7), 3, "view"),  # tied, sorts BEFORE the purchase
        (32, _ts(7), 3, "purchase"),
        (41, _ts(9), 4, "click"),
    ]
    d = _plant(spark, {"events": (rows, _EV_SCHEMA)})
    try:
        got = _assert_engine_parity(
            spark, "purchase_markov_attribution", d, ["events"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert set(got) == {"click", "view"}  # no '(conv)' channel row
    for r in got.values():
        assert r["p_conv_base"] == pytest.approx(0.75, abs=1e-9)
        assert r["removal_effect"] == pytest.approx(1 / 3, abs=1e-6)
        assert r["attribution_share"] == pytest.approx(0.5, abs=1e-6)
        assert r["p_conv_removed"] == pytest.approx(0.5, abs=1e-6)


def test_shapley_tie_strictly_before_first_purchase(spark):
    """u1 {click}->conv; u2 purchase + tied view sorting after (no
    touchpoints -> conversion unattributable, excluded from every
    coalition); u3 tied view sorting before -> {view}->conv; u4 click
    no conversion. v({c})=1, v({v})=1, v({c,v})=2 -> phi = (1, 1),
    shares 1/2 each, and efficiency sums to the 2 attributable
    conversions (not 3: u2's has no pre-purchase touch)."""
    rows = [
        (11, _ts(1), 1, "click"),
        (12, _ts(2), 1, "purchase"),
        (21, _ts(5), 2, "purchase"),
        (22, _ts(5), 2, "view"),  # tied, after -> must NOT earn credit
        (31, _ts(7), 3, "view"),  # tied, before -> earns credit
        (32, _ts(7), 3, "purchase"),
        (41, _ts(9), 4, "click"),
    ]
    d = _plant(spark, {"events": (rows, _EV_SCHEMA)})
    try:
        got = _assert_engine_parity(
            spark, "purchase_shapley_attribution", d, ["events"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert set(got) == {"click", "view"}
    assert got["click"]["shapley_conversions"] == pytest.approx(1.0, abs=1e-12)
    assert got["view"]["shapley_conversions"] == pytest.approx(1.0, abs=1e-12)
    assert got["click"]["attribution_share"] == pytest.approx(0.5, abs=1e-12)


def test_shapley_guard_mirrored_in_oracle(spark):
    """>12 channels must refuse in BOTH engines: the Spark side raises
    ValueError before enumerating 2^n subsets, and the SQL twin's nch
    CTE raises via error() instead of silently attempting the
    enumeration."""
    rows = [
        (i + 1, _ts(i), 1, f"ch{i:02d}") for i in range(13)
    ] + [(99, _ts(99), 1, "purchase")]
    d = _plant(spark, {"events": (rows, _EV_SCHEMA)})
    spec = get("purchase_shapley_attribution")
    try:
        with pytest.raises(ValueError, match="enumeration guard"):
            spec.fn(spark, d).collect()
        with pytest.raises(Exception, match="(?i)guard"):
            _oracle_rows(spec.sql, d, ["events"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bootstrap_ci_small_segment_survives_lost_replicates(spark):
    """A 1-order segment loses ~e^-1 of its 40 replicates to zero
    total weight; the nearest-rank indices must follow the SURVIVING
    count (old code indexed the fixed positions 1 and 39 -> NULL ci_hi
    once n_reps < 39). Both engines must agree on the planted data."""
    orders = [(1, 1, 100.0, "1995-01-01")] + [
        (k, 2, 100.0 + k, "1995-01-0%d" % (k % 9 + 1)) for k in range(2, 42)
    ]
    cust = [(1, "TINY"), (2, "BIG")]
    d = _plant(
        spark,
        {
            "orders": (
                orders,
                "o_orderkey long, o_custkey long, o_totalprice double, "
                "o_orderdate string",
            ),
            "customer": (cust, "c_custkey long, c_mktsegment string"),
        },
    )
    try:
        got = _assert_engine_parity(
            spark, "segment_revenue_bootstrap_ci", d, ["orders", "customer"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    tiny = got["TINY"]
    assert tiny["n_orders"] == 1
    assert tiny["n_reps"] < 40  # some replicates really were lost
    assert tiny["ci_lo"] is not None and tiny["ci_hi"] is not None
    # a single-order segment's surviving replicate means all equal x
    assert tiny["ci_lo"] == pytest.approx(100.0, abs=1e-6)
    assert tiny["ci_hi"] == pytest.approx(100.0, abs=1e-6)
    big = got["BIG"]
    assert big["ci_lo"] <= big["mean_revenue"] <= big["ci_hi"]


def test_theil_sen_integer_micro_unit_median(spark):
    """Five days of revenue with slopes {1, 2, 3, ...}/day: the lower
    median of the 10 pairwise slopes must come from the shared bigint
    micro-unit list. Values chosen so several slopes land on x.5e-6
    decimal boundaries — the shape where per-engine scale-6 double
    rounding diverged by one ulp."""
    days = ["1995-01-0%d" % i for i in range(1, 6)]
    # revenues engineered so pairwise differences / gaps are irregular
    revs = [100.00, 103.33, 104.17, 110.01, 111.11]
    orders = [
        (i + 1, 1, revs[i], days[i]) for i in range(5)
    ]
    d = _plant(
        spark,
        {
            "orders": (
                orders,
                "o_orderkey long, o_custkey long, o_totalprice double, "
                "o_orderdate string",
            )
        },
    )
    try:
        got = _assert_engine_parity(
            spark, "daily_revenue_trend_robust", d, ["orders"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    row = next(iter(got.values()))
    assert row["n_days"] == 5
    assert row["s_stat"] == 10  # strictly increasing series
    # hand check: 10 pairwise slopes, lower median = 5th smallest
    slopes = sorted(
        round((revs[j] - revs[i]) * 1e6 / (j - i)) / 1e6
        for i in range(5)
        for j in range(i + 1, 5)
    )
    assert row["theil_sen_slope"] == pytest.approx(slopes[4], abs=1e-9)
