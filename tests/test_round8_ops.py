"""Property pins for the round-8 operator wave (8 new oracle twins +
the perceptual image-dedup rows-only op).

Every twin additionally gets the partition-count-invariance check the
float policy mandates (run at shuffle.partitions 2 and 13, assert
identical rowset hashes — the exact failure mode of the r6 driver hash
mismatches), and the statistical ops get brute-force replications
against an independent computation at smoke scale.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from big_data_tools_spark.operators.cache import release_all_caches
from big_data_tools_spark.queries.registry import all_queries

_WAVE = [
    "customer_tcloseness",
    "orders_mannwhitney",
    "nation_supplier_hhi",
    "revenue_tail_hill",
    "events_kmv_setops",
    "events_burstiness",
    "documents_dp_release",
    "corpus_token_drift",
]


def _run(spark, name, sf):
    df = all_queries()[name].fn(spark, sf)
    rows = df.collect()
    release_all_caches()
    return rows


def _rowset_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted("|".join(repr(r[c]) for c in cols) for r in df.collect())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", _WAVE)
def test_partition_count_invariance(spark, sf_smoke, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = []
    for parts in (2, 13):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            hashes.append(_rowset_hash(all_queries()[name].fn(spark, sf_smoke)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
            release_all_caches()
    assert hashes[0] == hashes[1], f"{name}: rowset differs across partitions"


# --------------------------------------------------------- t-closeness


def test_tcloseness_bounds_and_coverage(spark, sf_smoke):
    rows = _run(spark, "customer_tcloseness", sf_smoke)
    assert rows
    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf_smoke}/orders.parquet' o"
        f" JOIN '{sf_smoke}/customer.parquet' c ON o.o_custkey = c.c_custkey"
    ).fetchone()[0]
    assert sum(r.n_orders for r in rows) == total  # QI groups partition orders
    for r in rows:
        # normalized ordered-EMD is a mean of |P_cum - Q_cum| <= 1 terms
        assert 0.0 <= r.emd <= 1.0
        assert r.t_close == (r.emd <= 0.2)
        assert r.emd_scaled >= 0


def test_tcloseness_brute_force(spark, sf_smoke):
    """Replicate the EMD for every QI group with plain Python."""
    rows = {(r.c_nationkey, r.c_mktsegment): r for r in _run(spark, "customer_tcloseness", sf_smoke)}
    raw = duckdb.sql(
        f"SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority"
        f" FROM '{sf_smoke}/orders.parquet' o"
        f" JOIN '{sf_smoke}/customer.parquet' c ON o.o_custkey = c.c_custkey"
    ).fetchall()
    prios = sorted({p for _, _, p in raw})
    k, n = len(prios), len(raw)
    global_counts = {p: sum(1 for _, _, q in raw if q == p) for p in prios}
    groups: dict[tuple, dict] = {}
    for nk, seg, p in raw:
        groups.setdefault((nk, seg), {q: 0 for q in prios})
        groups[(nk, seg)][p] += 1
    assert set(groups) == set(rows)
    for key, cnts in groups.items():
        ng = sum(cnts.values())
        f = gf = 0
        emd_scaled = 0
        for i, p in enumerate(prios):
            f += cnts[p]
            gf += global_counts[p]
            if i < k - 1:
                emd_scaled += abs(f * n - gf * ng)
        r = rows[key]
        assert r.emd_scaled == emd_scaled, key
        assert r.emd == pytest.approx(emd_scaled / (ng * n * (k - 1)), abs=1e-8)


# --------------------------------------------------------- Mann-Whitney


def test_mannwhitney_brute_force(spark, sf_smoke):
    (r,) = _run(spark, "orders_mannwhitney", sf_smoke)
    raw = duckdb.sql(
        f"SELECT o_totalprice, CAST(o_orderdate AS DATE) < DATE '1997-01-01'"
        f" FROM '{sf_smoke}/orders.parquet' WHERE o_totalprice IS NOT NULL"
    ).fetchall()
    s1 = sorted(x for x, pre in raw if pre)
    s2 = sorted(x for x, pre in raw if not pre)
    assert (r.n1, r.n2) == (len(s1), len(s2))
    # O(n1*n2) is fine at smoke scale
    u2 = sum(2 if a > b else (1 if a == b else 0) for a in s1 for b in s2)
    assert r.u2 == u2
    assert r.auc == pytest.approx(u2 / (2 * len(s1) * len(s2)), abs=1e-8)
    assert 0.0 <= r.auc <= 1.0
    from collections import Counter

    ties = Counter(x for x, _ in raw)
    assert r.tie_cubes == sum(t**3 - t for t in ties.values())


# --------------------------------------------------------- HHI


def test_hhi_bounds_and_brute_force(spark, sf_smoke):
    rows = _run(spark, "nation_supplier_hhi", sf_smoke)
    assert rows
    for r in rows:
        assert 1.0 / r.n_suppliers - 1e-9 <= r.hhi <= 1.0 + 1e-9
        assert r.effective_n <= r.n_suppliers + 1e-6
        assert r.top_share >= 1.0 / r.n_suppliers - 1e-9
        assert r.hhi >= r.top_share**2 - 1e-6  # top supplier alone
    # replicate one nation end to end
    name = rows[0].n_name
    sup = duckdb.sql(
        f"""
        SELECT l.l_suppkey,
               sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                        AS BIGINT)) AS cents
        FROM '{sf_smoke}/lineitem.parquet' l
        JOIN '{sf_smoke}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        JOIN '{sf_smoke}/nation.parquet' n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = '{name}' GROUP BY 1
        """
    ).fetchall()
    total = sum(c for _, c in sup)
    hhi = sum(round((c / total) * (c / total), 12) for _, c in sup)
    r = next(x for x in rows if x.n_name == name)
    assert r.n_suppliers == len(sup)
    assert r.total_cents == total
    assert r.hhi == pytest.approx(hhi, abs=1e-7)


# --------------------------------------------------------- Hill


def test_hill_brute_force(spark, sf_smoke):
    (r,) = _run(spark, "revenue_tail_hill", sf_smoke)
    cents = duckdb.sql(
        f"SELECT CAST(round(o_totalprice * 100) AS BIGINT)"
        f" FROM '{sf_smoke}/orders.parquet' WHERE o_totalprice IS NOT NULL"
        f" ORDER BY 1 DESC LIMIT {r.k + 1}"
    ).fetchall()
    top, xk1 = [c[0] for c in cents[: r.k]], cents[r.k][0]
    assert r.threshold_cents == xk1
    h = sum(round(math.log(x / xk1), 9) for x in top) / r.k
    assert r.hill_h == pytest.approx(h, abs=1e-6)
    assert r.tail_alpha == pytest.approx(1.0 / h, rel=1e-4)
    assert r.hill_h > 0


# --------------------------------------------------------- KMV set ops


def test_kmv_setops_consistency_and_error(spark, sf_oracle):
    (r,) = _run(spark, "events_kmv_setops", sf_oracle)
    # inclusion-exclusion holds exactly on the exact side
    assert r.exact_intersection == r.exact_a + r.exact_b - r.exact_union
    assert r.jaccard_exact == pytest.approx(
        r.exact_intersection / r.exact_union, abs=1e-8
    )
    # sketch error: KMV rse ~ 1/sqrt(k-2); allow 5 sigma
    rse = 1.0 / math.sqrt(r.k - 2)
    for est, exact in [
        (r.est_a, r.exact_a),
        (r.est_b, r.exact_b),
        (r.est_union, r.exact_union),
    ]:
        assert abs(est - exact) <= 5 * rse * exact, (est, exact)
    # rho/k Jaccard: binomial rse sqrt(j(1-j)/k); 5 sigma + small-k slack
    jtol = 5 * math.sqrt(max(r.jaccard_exact * (1 - r.jaccard_exact), 0.01) / r.k)
    assert abs(r.jaccard_est - r.jaccard_exact) <= jtol
    assert 0.0 <= r.jaccard_est <= 1.0


def test_kmv_setops_sketch_engaged_at_oracle_scale(spark, sf_oracle):
    (r,) = _run(spark, "events_kmv_setops", sf_oracle)
    # at sf0.01 the user-day sets exceed k, so the ESTIMATOR (not the
    # exact fallback) must be exercised
    assert r.exact_union > r.k
    assert r.est_union != r.exact_union


# --------------------------------------------------------- burstiness


def test_burstiness_brute_force(spark, sf_smoke):
    rows = {r.event_type: r for r in _run(spark, "events_burstiness", sf_smoke)}
    assert rows
    raw = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE) AS day, count(*)"
        f" FROM '{sf_smoke}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    days = sorted({d for _, d, _ in raw})
    for et, r in rows.items():
        counts = {d: 0 for d in days}
        for t, d, c in raw:
            if t == et:
                counts[d] = c
        xs = list(counts.values())
        n, mean = len(xs), sum(xs) / len(xs)
        var = sum((x - mean) ** 2 for x in xs) / (n - 1)
        assert r.n_days == n
        assert r.total == sum(xs)
        assert r.mean_daily == pytest.approx(mean, abs=1e-5)
        assert r.var_daily == pytest.approx(var, abs=1e-4)
        assert r.fano == pytest.approx(var / mean, abs=1e-4)
        sigma = math.sqrt(var)
        assert r.burstiness == pytest.approx(
            (sigma - mean) / (sigma + mean), abs=1e-5
        )
        assert -1.0 <= r.burstiness <= 1.0


# --------------------------------------------------------- DP release


def test_dp_release_mechanism(spark, sf_smoke):
    rows = _run(spark, "documents_dp_release", sf_smoke)
    assert len(rows) == 20  # one per source
    for r in rows:
        assert r.epsilon == 0.5
        assert r.released_count == r.true_count + round(r.noise)
        # Laplace(b=2) tail: P(|X| > 40) = exp(-20) ~ 2e-9 — a draw
        # outside this range means the inverse CDF is broken
        assert abs(r.noise) < 40.0
    # the deterministic draws must not be constant across sources
    assert len({r.noise for r in rows}) > 1
    assert any(r.noise > 0 for r in rows) and any(r.noise < 0 for r in rows)


def test_dp_release_laplace_quantiles(spark, sf_oracle):
    """The 20 per-source draws are iid Laplace(b=2) under the md5
    uniform; their median absolute value should sit near b*ln(2) —
    loose band, but catches a wrong scale or a wrong inverse CDF."""
    rows = _run(spark, "documents_dp_release", sf_oracle)
    med = sorted(abs(r.noise) for r in rows)[len(rows) // 2]
    assert 0.2 < med < 6.0  # b*ln2 = 1.386; 20 draws are noisy


# --------------------------------------------------------- token drift


def test_token_drift_brute_force(spark, sf_smoke):
    (r,) = _run(spark, "corpus_token_drift", sf_smoke)
    assert r.n_docs_a + r.n_docs_b > 0
    assert 0.0 <= r.jsd_bits <= 1.0  # JSD of two distributions <= 1 bit
    # replicate with libm logs (portable ln agrees to ~1e-13 rel)
    import sys

    sys.path.insert(0, ".")
    from big_data_tools_spark.operators.sampling import MD5_DENOM

    raw = duckdb.sql(
        f"SELECT doc_id, lower(text) FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    a_counts: dict[str, int] = {}
    b_counts: dict[str, int] = {}
    import hashlib as hl

    for doc_id, text in raw:
        digest = hl.md5(f"{doc_id}|tdrift0".encode()).hexdigest()
        u = (int(digest[:13], 16) + 1.0) / MD5_DENOM
        tgt = a_counts if u <= 0.5 else b_counts
        for w in text.split(" "):
            if w:
                tgt[w] = tgt.get(w, 0) + 1
    ta, tb = sum(a_counts.values()), sum(b_counts.values())
    assert (r.tokens_a, r.tokens_b) == (ta, tb)
    vocab = set(a_counts) | set(b_counts)
    assert r.vocab == len(vocab)
    s = 0.0
    for w in vocab:
        a, b = a_counts.get(w, 0), b_counts.get(w, 0)
        if a:
            s += round((a / ta) * math.log(2 * a * tb / (a * tb + b * ta)), 12)
        if b:
            s += round((b / tb) * math.log(2 * b * ta / (a * tb + b * ta)), 12)
    assert r.jsd_bits == pytest.approx(0.5 * s / math.log(2), abs=1e-7)
