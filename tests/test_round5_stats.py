"""Round-5 statistical-audit family: segment Gini, grouped OLS,
Benford first-digit audit, calendar-lag ACF, Welch A/B t-test,
Poisson-bootstrap CI, type-by-hour mutual information, Mann-Kendall
trend + Theil-Sen slope, Holt MASE/sMAPE accuracy, Spearman rank
correlation, Kaplan-Meier reorder survival, and Markov/Shapley
attribution — hand-computed fixture values or full Python
replications pinned (the registry-level DuckDB twins run in
test_oracle_parity; these tests prove the FORMULAS on planted data,
including tie closed-forms, calendar-gap semantics, censoring, and
the efficiency axiom — properties the parity sweep cannot
distinguish from plausible-but-wrong variants)."""

from __future__ import annotations

import datetime
import math
import shutil
import tempfile

import pytest

from big_data_tools_spark.queries import get


def _plant(spark, tables: dict[str, tuple[list, str]]) -> str:
    d = tempfile.mkdtemp(prefix="bdt_r5stats_")
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{name}.parquet")
    return d


def test_gini_planted_segments(spark):
    """Segment A revenues [1,2,3,4] -> G = (2*30 - 5*10)/(4*10) = 0.25.
    Segment B [2,2,6] has a tie run: the closed-form tie block must
    equal the naive per-customer ranking (Sigma i*x_i = 24 either way)
    -> G = (48 - 40)/30 = 0.266667."""
    orders = [
        (i + 1, float(x))
        for i, x in enumerate([1, 2, 3, 4])  # custkeys 1..4 segment A
    ] + [(5, 2.0), (6, 2.0), (7, 6.0)]  # segment B with a tie run
    cust = [(k, "A" if k <= 4 else "B") for k in range(1, 8)]
    d = _plant(
        spark,
        {
            "orders": (
                [(k, x) for k, x in orders],
                "o_custkey long, o_totalprice double",
            ),
            "customer": (cust, "c_custkey long, c_mktsegment string"),
        },
    )
    try:
        got = {
            r["c_mktsegment"]: (r["n_customers"], r["revenue_total"], r["gini"])
            for r in get("segment_revenue_gini").fn(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got["A"] == (4, 10.0, 0.25)
    assert got["B"][0] == 3
    assert got["B"][1] == 10.0
    assert got["B"][2] == pytest.approx(round(8 / 30, 6), abs=1e-9)


def test_gini_uniform_is_zero(spark):
    """Equal revenues -> zero concentration, exactly."""
    d = _plant(
        spark,
        {
            "orders": (
                [(k, 5.0) for k in range(1, 6)],
                "o_custkey long, o_totalprice double",
            ),
            "customer": (
                [(k, "U") for k in range(1, 6)],
                "c_custkey long, c_mktsegment string",
            ),
        },
    )
    try:
        [row] = get("segment_revenue_gini").fn(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert row["gini"] == 0.0


def test_ols_perfect_line_and_noisy_group(spark):
    """Group N lies exactly on y = 2x + 1 -> slope 2, intercept 1,
    r2 = 1. Group R is hand-noisy; pin against the closed-form moment
    arithmetic replicated in Python with the query's quantization."""
    line = [("N", 0.0 + 0.1 * i, 1.0 + 0.2 * i) for i in range(4)]
    noisy = [("R", 0.00, 10.0), ("R", 0.05, 13.0), ("R", 0.10, 11.0),
             ("R", 0.15, 18.0)]
    d = _plant(
        spark,
        {
            "lineitem": (
                line + noisy,
                "l_returnflag string, l_discount double, l_quantity double",
            )
        },
    )
    try:
        got = {
            r["l_returnflag"]: (r["n_lines"], r["slope"], r["intercept"], r["r2"])
            for r in get("discount_quantity_ols").fn(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got["N"] == (4, 2.0, 1.0, 1.0)

    xs = [x for _, x, _ in noisy]
    ys = [y for _, _, y in noisy]
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(round(x * y, 8) for x, y in zip(xs, ys))
    sxx = sum(round(x * x, 8) for x in xs)
    syy = sum(round(y * y, 8) for y in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    want = (
        4,
        round(slope, 6),
        round((sy - slope * sx) / n, 6),
        round(
            (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ),
    )
    assert got["R"] == pytest.approx(want, abs=1e-6)
    assert 0.0 < got["R"][3] < 1.0  # noise really degrades the fit


def test_benford_planted_digits(spark):
    """First digits come from the exact decimal render: totals
    [1.00, 19.50, 2.00, 29.00, 900.00] -> digits 1,1,2,2,9 ->
    counts {1:2, 2:2, 9:1}; expected counts and chi-square terms
    replicate total*log10(1+1/d) by hand."""
    totals = [1.00, 19.50, 2.00, 29.00, 900.00]
    d = _plant(
        spark,
        {
            "orders": (
                [(i, t) for i, t in enumerate(totals)],
                "o_orderkey long, o_totalprice double",
            )
        },
    )
    try:
        got = {
            r["digit"]: (r["n"], r["expected_n"], r["chi2_term"])
            for r in get("orders_benford_digits").fn(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    total = 5.0
    for digit, n in [(1, 2), (2, 2), (9, 1)]:
        e = total * math.log10(1.0 + 1.0 / digit)
        assert got[digit][0] == n
        assert got[digit][1] == pytest.approx(round(e, 2), abs=1e-9)
        assert got[digit][2] == pytest.approx(round((n - e) ** 2 / e, 6), abs=1e-6)
    assert set(got) == {1, 2, 9}


def test_acf_calendar_lag_respects_date_gaps(spark):
    """Days 1,2,3,5 (day 4 missing). A row-offset lag would pair
    day5 with day3 at lag 1; the calendar join must NOT -> lag-1
    n_pairs is 2, and lag-2 pairs are (3,1) and (5,3) -> 2. Values
    replicated in Python with the query's quantization."""
    day = lambda n: datetime.date(2024, 1, n)  # noqa: E731
    daily = {day(1): 10.0, day(2): 30.0, day(3): 20.0, day(5): 40.0}
    d = _plant(
        spark,
        {
            "orders": (
                [(i, dt, v) for i, (dt, v) in enumerate(daily.items())],
                "o_orderkey long, o_orderdate date, o_totalprice double",
            )
        },
    )
    try:
        got = {
            r["lag"]: (r["n_pairs"], r["acf"])
            for r in get("daily_revenue_acf").fn(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    mu = sum(daily.values()) / len(daily)
    dev = {dt: v - mu for dt, v in daily.items()}
    den = sum(round(x * x, 6) for x in dev.values())
    want = {}
    for lag in range(1, 11):
        pairs = [
            (dev[dt], dev[dt - datetime.timedelta(days=lag)])
            for dt in daily
            if dt - datetime.timedelta(days=lag) in daily
        ]
        if pairs:
            want[lag] = (
                len(pairs),
                round(sum(round(a * b, 6) for a, b in pairs) / den, 6),
            )
    assert set(got) == set(want)
    assert got[1][0] == 2  # day5 never pairs with day3 at lag 1
    assert got[2][0] == 2
    for lag, (n_pairs, acf) in want.items():
        assert got[lag][0] == n_pairs
        assert got[lag][1] == pytest.approx(acf, abs=1e-6)


def test_welch_ab_matches_python_replication(spark):
    """Arms come from the shared portable md5 draw — replicate it and
    the quantized Welch arithmetic in Python on planted events. A
    group whose arms can't both reach n>=2 must be excluded."""
    import hashlib

    def u01(uid: int) -> float:
        h = int(hashlib.md5(f"{uid}|ab0".encode()).hexdigest()[:13], 16)
        return (h + 1.0) / float((1 << 52) + 1)

    rows, vals = [], {}
    for uid in range(1, 25):
        v = 3.0 + (uid % 7) * 1.25 + (0.5 if u01(uid) < 0.5 else 0.0)
        rows.append((uid, "purchase", v))
        vals.setdefault(u01(uid) < 0.5, []).append(v)
    # a sparse group: three users, all in one arm or 2/1 split ->
    # whichever arm has <2 members kills the group
    sparse_uids = [u for u in range(100, 200) if u01(u) < 0.5][:1] + [
        u for u in range(100, 200) if u01(u) >= 0.5
    ][:2]
    rows += [(u, "sparse", 1.0) for u in sparse_uids]
    d = _plant(spark, {"events": (rows, "user_id long, event_type string, value double")})
    try:
        got = {r["event_type"]: r.asDict() for r in
               get("event_value_welch_ab").fn(spark, d).collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert "sparse" not in got  # arm of size 1 -> variance undefined
    r = got["purchase"]
    a, b = vals[True], vals[False]
    na, nb = float(len(a)), float(len(b))
    sa, sb = sum(round(v, 2) for v in a), sum(round(v, 2) for v in b)
    qa = sum(round(v * v, 6) for v in a)
    qb = sum(round(v * v, 6) for v in b)
    wa = (qa - sa * sa / na) / (na - 1) / na
    wb = (qb - sb * sb / nb) / (nb - 1) / nb
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert r["mean_a"] == pytest.approx(round(sa / na, 6), abs=1e-9)
    assert r["mean_b"] == pytest.approx(round(sb / nb, 6), abs=1e-9)
    assert r["t_stat"] == pytest.approx(
        round((sa / na - sb / nb) / (wa + wb) ** 0.5, 6), abs=1e-6
    )
    assert r["df_welch"] == pytest.approx(
        round((wa + wb) ** 2 / (wa**2 / (na - 1) + wb**2 / (nb - 1)), 6),
        abs=1e-6,
    )
    # the planted +0.5 arm-A lift must surface as a positive t
    assert r["t_stat"] > 0


def test_bootstrap_ci_matches_python_replication(spark):
    """Replicate the full Poisson-bootstrap pipeline in Python — md5
    uniform, inverse-CDF weight, replicate means, nearest-rank CI —
    on a planted single-segment orders table. The CI must bracket the
    point mean, and every output value must match the replication."""
    import hashlib

    from big_data_tools_spark.operators.sampling import _POIS1_CDF
    from big_data_tools_spark.queries.analytics import _BOOT_B, _BOOT_SALT

    def u01(key: str) -> float:
        h = int(hashlib.md5(f"{key}|{_BOOT_SALT}".encode()).hexdigest()[:13], 16)
        return (h + 1.0) / float((1 << 52) + 1)

    def pois(u: float) -> int:
        for k, c in enumerate(_POIS1_CDF):
            if u <= c:
                return k
        return 9

    vals = {k: round(5.0 + (k % 11) * 2.5, 2) for k in range(1, 61)}
    d = _plant(
        spark,
        {
            "orders": (
                [(k, 100 + k, v) for k, v in vals.items()],
                "o_orderkey long, o_custkey long, o_totalprice double",
            ),
            "customer": (
                [(100 + k, "S") for k in vals],
                "c_custkey long, c_mktsegment string",
            ),
        },
    )
    try:
        [r] = get("segment_revenue_bootstrap_ci").fn(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)

    means = []
    for b in range(_BOOT_B):
        ws = {k: pois(u01(f"{k}#{b}")) for k in vals}
        tot = sum(ws.values())
        if tot > 0:
            means.append(sum(w * vals[k] for k, w in ws.items()) / tot)
    means.sort()
    assert r["n_orders"] == 60
    assert r["n_reps"] == len(means)
    point = sum(vals.values()) / len(vals)
    assert r["mean_revenue"] == pytest.approx(round(point, 6), abs=1e-9)
    assert r["ci_lo"] == pytest.approx(round(means[0], 6), abs=1e-6)
    assert r["ci_hi"] == pytest.approx(round(means[_BOOT_B - 2], 6), abs=1e-6)
    assert r["ci_lo"] < r["mean_revenue"] < r["ci_hi"]


def test_mutual_info_planted_extremes(spark):
    """Independent planted grid -> MI = 0 and every PMI = 0;
    perfectly type<->hour dependent grid -> MI = 1 bit with PMI
    +1 on the diagonal."""
    ts0 = datetime.datetime(2024, 1, 1, 0, 30)
    ts1 = datetime.datetime(2024, 1, 1, 1, 30)

    def plant(rows):
        return _plant(
            spark,
            {
                "events": (
                    [(i, t, ts) for i, (t, ts) in enumerate(rows)],
                    "event_id long, event_type string, ts timestamp",
                )
            },
        )

    # independent: every (type, hour) cell has 5 events
    rows = [(t, ts) for t in ("a", "b") for ts in (ts0, ts1) for _ in range(5)]
    d = plant(rows)
    try:
        out = get("event_type_hour_mutual_info").fn(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert len(out) == 4
    assert all(r["mi_bits"] == 0.0 and r["pmi_bits"] == 0.0 for r in out)

    # dependent: type a only in hour 0, type b only in hour 1
    rows = [("a", ts0)] * 6 + [("b", ts1)] * 6
    d = plant(rows)
    try:
        out = get("event_type_hour_mutual_info").fn(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert len(out) == 2
    for r in out:
        assert r["mi_bits"] == pytest.approx(1.0, abs=1e-5)
        assert r["pmi_bits"] == pytest.approx(1.0, abs=1e-5)


def _mk_python(daily: dict) -> tuple:
    """Mann-Kendall + Theil-Sen replication (query quantization)."""
    days = sorted(daily)
    s = 0
    slopes = []
    for i, da in enumerate(days):
        for db in days[i + 1 :]:
            d = daily[db] - daily[da]
            s += (d > 0) - (d < 0)
            slopes.append(round(d / (db - da).days, 6))
    slopes.sort()
    m = len(slopes)
    from collections import Counter

    tie = sum(
        t * (t - 1) * (2 * t + 5)
        for t in Counter(daily.values()).values()
        if t > 1
    )
    n = len(days)
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18
    z = 0.0 if s == 0 else round((s - (1 if s > 0 else -1)) / var**0.5, 6)
    return s, var, z, slopes[(m + 1) // 2 - 1]


def test_mann_kendall_planted_series(spark):
    day = lambda n: datetime.date(2024, 1, n)  # noqa: E731

    def run(daily):
        d = _plant(
            spark,
            {
                "orders": (
                    [(i, dt, v) for i, (dt, v) in enumerate(daily.items())],
                    "o_orderkey long, o_orderdate date, o_totalprice double",
                )
            },
        )
        try:
            [r] = get("daily_revenue_trend_robust").fn(spark, d).collect()
        finally:
            shutil.rmtree(d, ignore_errors=True)
        return r

    # strictly increasing: S = C(5,2) = 10, slope = 2/day everywhere
    daily = {day(i): 10.0 + 2.0 * i for i in range(1, 6)}
    r = run(daily)
    assert (r["n_days"], r["s_stat"]) == (5, 10)
    assert r["theil_sen_slope"] == pytest.approx(2.0, abs=1e-9)
    s, var, z, slope = _mk_python(daily)
    assert r["mk_z"] == pytest.approx(z, abs=1e-6)

    # flat series: every pair ties -> S = 0, z = 0 (tie-corrected
    # variance hits exactly 0), slope 0
    daily = {day(i): 7.0 for i in range(1, 6)}
    r = run(daily)
    assert (r["s_stat"], r["mk_z"], r["var_s"]) == (0, 0.0, 0.0)
    assert r["theil_sen_slope"] == 0.0

    # irregular series with a gap and one tie: full replication
    daily = {
        day(1): 5.0,
        day(2): 9.0,
        day(3): 7.0,
        day(5): 9.0,
        day(8): 12.0,
        day(9): 4.0,
    }
    r = run(daily)
    s, var, z, slope = _mk_python(daily)
    assert r["s_stat"] == s
    assert r["var_s"] == pytest.approx(var, abs=1e-9)
    assert r["mk_z"] == pytest.approx(z, abs=1e-6)
    assert r["theil_sen_slope"] == pytest.approx(slope, abs=1e-6)


def test_forecast_accuracy_matches_python_replication(spark):
    """Replicate the integer-micro-unit Holt error fold in Python on a
    planted monthly series; also pin MASE < 1 on a strongly trending
    series (Holt must beat the naive forecast there)."""
    series = [100.0, 120.0, 139.0, 161.0, 178.0, 202.0, 219.0, 241.0]
    d = _plant(
        spark,
        {
            "orders": (
                [
                    (i, datetime.date(2024, m + 1, 5), v)
                    for m, v in enumerate(series)
                    for i in [m]
                ],
                "o_orderkey long, o_orderdate date, o_totalprice double",
            )
        },
    )
    try:
        [r] = get("monthly_forecast_accuracy").fn(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)

    a, b = 0.5, 0.3
    M = 1_000_000.0
    l_u = round(series[0] * M)
    b_u = round((series[1] - series[0]) * M)
    se_u = sn_u = ss_u = 0
    py = series[0]
    for y in series[1:]:
        pred = (l_u + b_u) / M
        se_u += round(abs(y - pred) * M)
        sn_u += round(abs(y - py) * M)
        den = abs(y) + abs(pred)
        if den != 0:
            ss_u += round(2 * abs(y - pred) / den * 1e8)
        new_l_u = round((a * y + (1 - a) * pred) * M)
        b_u = round((b * ((new_l_u - l_u) / M) + (1 - b) * (b_u / M)) * M)
        l_u = new_l_u
        py = y
    k = len(series) - 1
    assert r["n_steps"] == k
    assert r["mae"] == pytest.approx(se_u / M / k, abs=1e-9)
    assert r["naive_mae"] == pytest.approx(sn_u / M / k, abs=1e-9)
    assert r["mase"] == pytest.approx(se_u / sn_u, abs=1e-9)
    assert r["smape"] == pytest.approx(ss_u / 1e8 / k, abs=1e-9)
    assert r["mase"] < 1.0  # trending series: Holt beats last-value naive


def test_spearman_planted_extremes(spark):
    """Monotone relation (any shape) -> rho = 1 exactly; reversed ->
    -1; a hand-tied dataset replicates scipy's tie-aware definition
    (computed by hand: average ranks, Pearson over ranks)."""

    def run(rows):
        d = _plant(
            spark,
            {
                "lineitem": (
                    rows,
                    "l_returnflag string, l_discount double, l_quantity double",
                )
            },
        )
        try:
            return {
                r["l_returnflag"]: (r["n_lines"], r["spearman_rho"])
                for r in get("discount_quantity_spearman").fn(spark, d).collect()
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)

    # monotone nonlinear (rho=1) and reversed (rho=-1)
    up = [("U", 0.01 * i, float(i * i)) for i in range(1, 6)]
    dn = [("D", 0.01 * i, float(36 - i * i)) for i in range(1, 6)]
    got = run(up + dn)
    assert got["U"] == (5, pytest.approx(1.0, abs=1e-12))
    assert got["D"] == (5, pytest.approx(-1.0, abs=1e-12))

    # ties on both sides: x = [1,1,2,2], y = [3,4,4,5] (paired in
    # order). Average ranks: rx = [1.5,1.5,3.5,3.5],
    # ry = [1,2.5,2.5,4]. Pearson over those = 0.8944271909999159
    # (hand: cov = 1.25, sx = sqrt(1.25... ) -> rho = 2.5/2.795084...)
    tied = [("T", 0.01, 3.0), ("T", 0.01, 4.0), ("T", 0.02, 4.0), ("T", 0.02, 5.0)]
    got = run(tied)
    rx = [1.5, 1.5, 3.5, 3.5]
    ry = [1.0, 2.5, 2.5, 4.0]
    n = 4.0
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    want = (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
    )
    assert got["T"] == (4, pytest.approx(want, abs=1e-12))


def test_kaplan_meier_textbook_curve(spark):
    """Durations [1e, 2c, 3e, 4c, 5e] (e=reorder event, c=censored):
    S = 0.8 at t=1, unchanged at the censoring times, 0.8*(2/3) at
    t=3, and 0 at t=5 (last at-risk subject dies). Censored subjects
    are customers with a single order, cut at the global max order
    date (2024-01-06)."""
    day = lambda n: datetime.date(2024, 1, n)  # noqa: E731
    rows = [
        # events: first order day 1, reorder at day 1+t
        (1, 10, day(1)), (2, 10, day(2)),       # t=1 event
        (3, 30, day(1)), (4, 30, day(4)),       # t=3 event
        (5, 50, day(1)), (6, 50, day(6)),       # t=5 event (sets horizon)
        # censored: single order, duration = horizon - first
        (7, 20, day(4)),                        # t=2 censored
        (8, 40, day(2)),                        # t=4 censored
    ]
    d = _plant(
        spark,
        {
            "orders": (
                rows,
                "o_orderkey long, o_custkey long, o_orderdate date",
            )
        },
    )
    try:
        got = {
            r["duration_days"]: (
                r["n_at_risk"],
                r["n_events"],
                r["n_censored"],
                r["survival"],
            )
            for r in get("customer_reorder_survival").fn(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got[1] == (5, 1, 0, pytest.approx(0.8, abs=1e-9))
    assert got[2] == (4, 0, 1, pytest.approx(0.8, abs=1e-9))
    assert got[3] == (3, 1, 0, pytest.approx(0.533333333, abs=1e-9))
    assert got[4] == (2, 0, 1, pytest.approx(0.533333333, abs=1e-9))
    assert got[5] == (1, 1, 0, 0.0)
    assert len(got) == 5


def test_markov_attribution_hand_chain(spark):
    """Five journeys: click->purchase, click->view(end), view->purchase,
    view(end), click->purchase. Exact chain: P(conv) = 0.6; removing
    click loses 0.7778 of it, removing view 0.3333 -> shares 0.7/0.3."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0)
    mins = lambda m: t0 + datetime.timedelta(minutes=m)  # noqa: E731
    journeys = {
        1: ["click", "purchase"],
        2: ["click", "view"],
        3: ["view", "purchase"],
        4: ["view"],
        5: ["click", "purchase"],
    }
    rows = [
        (uid * 100 + i, mins(uid * 100 + i), uid, et)
        for uid, seq in journeys.items()
        for i, et in enumerate(seq)
    ]
    d = _plant(
        spark,
        {
            "events": (
                rows,
                "event_id long, ts timestamp, user_id long, event_type string",
            )
        },
    )
    try:
        got = {
            r["channel"]: r.asDict()
            for r in get("purchase_markov_attribution").fn(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert set(got) == {"click", "view"}
    for r in got.values():
        assert r["p_conv_base"] == pytest.approx(0.6, abs=2e-3)
    assert got["click"]["removal_effect"] == pytest.approx(7 / 9, abs=2e-3)
    assert got["view"]["removal_effect"] == pytest.approx(1 / 3, abs=2e-3)
    assert got["click"]["attribution_share"] == pytest.approx(0.7, abs=2e-3)
    assert got["view"]["attribution_share"] == pytest.approx(0.3, abs=2e-3)
    # removing a channel can only lose conversion probability
    for r in got.values():
        assert r["p_conv_removed"] <= r["p_conv_base"] + 1e-9


def test_shapley_attribution_efficiency_axiom(spark):
    """Journeys {c}+conv, {v}+conv, {c,v}+conv, {c} no-conv, {v}
    no-conv: v({c})=1, v({v})=1, v({c,v})=3 -> phi = (1.5, 1.5),
    sum = total conversions (efficiency). Dropping the {v}-only
    conversion makes it asymmetric: phi = (1.5, 0.5) -> shares
    0.75/0.25."""
    t0 = datetime.datetime(2024, 1, 1)
    m = lambda k: t0 + datetime.timedelta(minutes=k)  # noqa: E731

    def run(journeys):
        rows = [
            (u * 100 + i, m(u * 100 + i), u, et)
            for u, seq in journeys.items()
            for i, et in enumerate(seq)
        ]
        d = _plant(
            spark,
            {
                "events": (
                    rows,
                    "event_id long, ts timestamp, user_id long, event_type string",
                )
            },
        )
        try:
            return {
                r["channel"]: (r["shapley_conversions"], r["attribution_share"])
                for r in get("purchase_shapley_attribution").fn(spark, d).collect()
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)

    sym = {
        1: ["click", "purchase"],
        2: ["view", "purchase"],
        3: ["click", "view", "purchase"],
        4: ["click"],
        5: ["view"],
    }
    got = run(sym)
    assert got["click"][0] == pytest.approx(1.5, abs=1e-12)
    assert got["view"][0] == pytest.approx(1.5, abs=1e-12)
    # efficiency: Shapley values sum to total attributable conversions
    assert sum(v for v, _ in got.values()) == pytest.approx(3.0, abs=1e-12)
    assert got["click"][1] == pytest.approx(0.5, abs=1e-12)

    asym = {k: v for k, v in sym.items() if k != 2}
    got = run(asym)
    assert got["click"][0] == pytest.approx(1.5, abs=1e-12)
    assert got["view"][0] == pytest.approx(0.5, abs=1e-12)
    assert got["click"][1] == pytest.approx(0.75, abs=1e-12)
    assert sum(v for v, _ in got.values()) == pytest.approx(2.0, abs=1e-12)
