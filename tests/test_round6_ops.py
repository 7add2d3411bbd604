"""Round-6 operator family on planted fixtures: HITS hubs/authorities
(bit-exact Python replication of the quantized fold), the CUSUM-argmax
changepoint, JSD drift (zero on identical distributions), Cramer's V
(0 at independence, 1 at perfect association), and the embedding
outlier audit (least-prototypical ranks). Each fixture also runs the
registered DuckDB twin on the same planted parquet (the sf corpora
never exhibit these closed-form shapes)."""

from __future__ import annotations

import math

import pytest

from big_data_tools_spark.queries import get

from .test_round6_fixes import (
    _EV_SCHEMA,
    _assert_engine_parity,
    _plant,
    _ts,
    shutil,
)


_ORD = "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string"


def test_hits_matches_exact_python_replication(spark):
    """c1 buys {p1,p2,p3}, c2 buys {p1}: p1 must be the top authority
    and c1 the top hub, with scores equal to a bit-exact Python
    replication of the floor-quantized max-normalized fold."""
    orders = [(1, 1, 10.0, "1995-01-01"), (2, 2, 10.0, "1995-01-02")]
    lineitem = [(1, 101), (1, 102), (1, 103), (2, 101)]
    d = _plant(
        spark,
        {
            "orders": (orders, _ORD),
            "lineitem": (lineitem, "l_orderkey long, l_partkey long"),
        },
    )
    try:
        got = {
            (r["role"], r["node"]): r["score"]
            for r in get("purchase_hits_scores").fn(spark, d).collect()
        }
        _assert_engine_parity(
            spark, "purchase_hits_scores", d, ["orders", "lineitem"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)

    # replicate the quantized fold exactly (floats mirror IEEE ops)
    edges = [(1, 101), (1, 102), (1, 103), (2, 101)]
    hub = {1: 1.0, 2: 1.0}
    auth: dict[int, float] = {}
    for _ in range(4):
        araw: dict[int, int] = {}
        for c, p in edges:
            araw[p] = araw.get(p, 0) + math.floor(hub[c] * 1e6)
        amax = max(araw.values())
        auth = {p: v / amax for p, v in araw.items()}
        hraw: dict[int, int] = {}
        for c, p in edges:
            hraw[c] = hraw.get(c, 0) + math.floor(auth[p] * 1e6)
        hmax = max(hraw.values())
        hub = {c: v / hmax for c, v in hraw.items()}
    for p, v in auth.items():
        assert got[("authority", p)] == v
    for c, v in hub.items():
        assert got[("hub", c)] == v
    assert got[("authority", 101)] == 1.0  # p1 is the max-normalized top
    assert got[("hub", 1)] == 1.0
    assert got[("authority", 102)] < 1.0 and got[("hub", 2)] < 1.0


def test_changepoint_planted_level_shift(spark):
    """Series 100,100,100,200,200 (one order per day): the CUSUM
    argmax must land after day 3 with pre/post means 100/200."""
    orders = [
        (i + 1, 1, x, "1995-01-0%d" % (i + 1))
        for i, x in enumerate([100.0, 100.0, 100.0, 200.0, 200.0])
    ]
    d = _plant(spark, {"orders": (orders, _ORD)})
    try:
        got = _assert_engine_parity(
            spark, "daily_revenue_changepoint", d, ["orders"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    row = next(iter(got.values()))
    assert str(row["changepoint_day"]) == "1995-01-03"
    assert row["t_index"] == 3 and row["n_days"] == 5
    assert row["cusum_stat"] == 60000  # |5*30000 - 3*70000| in cents
    assert row["pre_mean"] == pytest.approx(100.0, abs=1e-9)
    assert row["post_mean"] == pytest.approx(200.0, abs=1e-9)
    assert row["shift"] == pytest.approx(100.0, abs=1e-9)


def test_jsd_zero_on_identical_distributions(spark):
    """Identical before/after histograms -> every per-bin term is 0
    and jsd_bits == 0 exactly (p == q bin-by-bin after smoothing)."""
    orders = []
    k = 1
    for era_day in ("1995-06-01", "1997-06-01"):  # before / after cutoff
        for price in (100.0, 100.0, 900.0):
            orders.append((k, 1, price, era_day))
            k += 1
    d = _plant(spark, {"orders": (orders, _ORD)})
    try:
        got = _assert_engine_parity(spark, "orders_price_jsd", d, ["orders"])
    finally:
        shutil.rmtree(d, ignore_errors=True)
    for row in got.values():
        assert row["jsd_term"] == 0.0
        assert row["jsd_bits"] == 0.0
        assert row["n_before"] == row["n_after"]


def test_jsd_bounded_on_disjoint_distributions(spark):
    """Fully swapped mass between eras: JSD must be positive and
    bounded by 1 bit, and equal the decimal sum of its terms."""
    orders = [(1, 1, 100.0, "1995-06-01"), (2, 1, 100.0, "1995-06-02"),
              (3, 1, 900.0, "1997-06-01"), (4, 1, 900.0, "1997-06-02")]
    d = _plant(spark, {"orders": (orders, _ORD)})
    try:
        got = _assert_engine_parity(spark, "orders_price_jsd", d, ["orders"])
    finally:
        shutil.rmtree(d, ignore_errors=True)
    rows = list(got.values())
    total = rows[0]["jsd_bits"]
    assert 0.0 < total <= 1.0
    assert total == pytest.approx(
        round(sum(r["jsd_term"] for r in rows), 6), abs=1e-9
    )


def test_cramers_v_extremes(spark):
    """Perfect association (priority determines status) -> V = 1;
    perfect independence -> V = 0 with all residuals 0."""
    schema = (
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderstatus string"
    )

    def run(rows):
        d = _plant(spark, {"orders": (rows, schema)})
        try:
            return _assert_engine_parity(
                spark, "priority_status_cramers_v", d, ["orders"]
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)

    assoc = [(i, 1, "A", "X") for i in range(10)] + [
        (i + 10, 1, "B", "Y") for i in range(10)
    ]
    got = run(assoc)
    row = next(iter(got.values()))
    assert row["cramers_v"] == pytest.approx(1.0, abs=1e-6)
    assert row["chi2"] == pytest.approx(20.0, abs=1e-6)

    indep = [
        (i * 4 + j, 1, p, s)
        for i in range(5)
        for j, (p, s) in enumerate(
            [("A", "X"), ("A", "Y"), ("B", "X"), ("B", "Y")]
        )
    ]
    got = run(indep)
    for r in got.values():
        assert r["cramers_v"] == 0.0
        assert r["std_residual"] == 0.0
        assert r["observed"] == 5 and r["expected"] == pytest.approx(5.0)


def test_embedding_outlier_audit_ranks_least_prototypical(spark):
    """Two on-axis vectors and one orthogonal: the orthogonal vector
    must take atypicality rank 1 with the hand-computed cosine."""
    emb = [
        (1, "L", [1.0, 0.0]),
        (2, "L", [1.0, 0.0]),
        (3, "L", [0.0, 1.0]),
    ]
    d = _plant(
        spark,
        {"embeddings": (emb, "vec_id long, label string, embedding array<double>")},
    )
    try:
        sdf = get("embedding_outlier_audit").fn(spark, d)
        rows = {r["vec_id"]: r.asDict() for r in sdf.collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert rows[3]["atypicality_rank"] == 1
    # centroid (0.666667, 0.333333); cos(v3) = 0.333333/|c| -> 0.4472
    assert rows[3]["cos_centroid"] == pytest.approx(0.4472, abs=1e-4)
    assert rows[1]["cos_centroid"] == pytest.approx(0.8944, abs=1e-4)
    assert rows[1]["atypicality_rank"] in (2, 3)


def test_kmv_sketch_matches_python_replication(spark):
    """500 planted users across 3 event types: the KMV estimate must
    equal a hashlib replication of (k-1)/u_(k) over the 128 smallest
    md5 uniforms, and the per-type partial sketches must union-merge
    to the identical global k-min."""
    import hashlib

    rows = [
        (i, _ts(i % 600), i % 500, ["click", "view", "purchase"][i % 3])
        for i in range(1500)
    ]
    d = _plant(spark, {"events": (rows, _EV_SCHEMA)})
    try:
        got = _assert_engine_parity(
            spark, "events_user_kmv_distinct", d, ["events"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    row = next(iter(got.values()))

    def u_of(uid: int) -> float:
        h = hashlib.md5(f"{uid}|kmv0".encode()).hexdigest()[:13]
        return (int(h, 16) + 1.0) / float((1 << 52) + 1)

    us = sorted(u_of(uid) for uid in range(500))
    kth = us[127]
    assert row["exact_distinct"] == 500
    assert row["k_eff"] == 128
    assert row["kth_min"] == kth
    assert row["est_distinct"] == 127 / kth
    assert row["merge_identity_ok"] is True
    # KMV error bound: |est/n - 1| within ~3/sqrt(k) w.h.p.
    assert abs(row["rel_error"]) < 3 / (128 ** 0.5)


def test_mixture_ess_hand_values(spark):
    """Sources with 1 and 4 docs at tau=2: q = (1/3, 2/3), upweights
    r = (5/3, 5/6), ESS = 25/(50/9) = 4.5, ratio 0.9 — all closed
    form."""
    docs = [(1, "s1", "a b c")] + [(i, "s4", "d e f") for i in range(2, 6)]
    d = _plant(
        spark,
        {"documents": (docs, "doc_id long, source string, text string")},
    )
    try:
        got = _assert_engine_parity(
            spark, "source_mixture_ess", d, ["documents"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got["s1"]["temp_weight"] == pytest.approx(1 / 3, abs=1e-6)
    assert got["s4"]["temp_weight"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["s1"]["doc_upweight"] == pytest.approx(5 / 3, abs=1e-6)
    assert got["s4"]["doc_upweight"] == pytest.approx(5 / 6, abs=1e-6)
    for r in got.values():
        assert r["ess"] == pytest.approx(4.5, abs=0.01)
        assert r["ess_ratio"] == pytest.approx(0.9, abs=1e-4)


def test_dedup_impact_charges_the_copy_not_the_original(spark):
    """A duplicate group spanning sources must charge the REMOVED
    copy's source: doc 1 (source A) survives, doc 2 (source B, same
    normalized text) is removed — B loses the tokens, A loses none."""
    docs = [
        (1, "A", "hello    world foo"),
        (2, "B", "  HELLO world foo "),  # same after normalization
        (3, "B", "completely different text here"),
    ]
    d = _plant(
        spark,
        {"documents": (docs, "doc_id long, source string, text string")},
    )
    try:
        got = _assert_engine_parity(
            spark, "dedup_impact_by_source", d, ["documents"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got["A"]["n_removed"] == 0
    assert got["A"]["token_removal_frac"] == 0.0
    assert got["B"]["n_removed"] == 1
    assert got["B"]["n_docs"] == 2
    assert got["B"]["doc_removal_frac"] == 0.5
