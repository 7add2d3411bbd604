"""Planted fixtures for the round-9 operator wave: containment
(overlap-coefficient) dedup, functional-dependency audit, embedding
hubness. Each gets (a) a behavioral pin on a constructed input whose
correct answer is known by design, and (b) the full driver-style
DuckDB compare on that same fixture."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from big_data_tools_spark.queries.registry import all_queries

from .oracle import compare


def _fixture_dir(tmp_path, tables: dict[str, pa.Table]) -> str:
    from big_data_tools_spark.io.schemas import TABLE_NAMES

    from .conftest import SF_SMOKE

    for name, tbl in tables.items():
        pq.write_table(tbl, str(tmp_path / f"{name}.parquet"))
    for name in TABLE_NAMES:
        if name not in tables:
            os.symlink(
                os.path.join(SF_SMOKE, f"{name}.parquet"),
                str(tmp_path / f"{name}.parquet"),
            )
    return str(tmp_path)


def _docs_table(texts: list[str]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


# ------------------------------------------------------- containment
def test_containment_finds_quote_jaccard_misses(spark, tmp_path):
    """Doc 0 is quoted WHOLE inside the much longer doc 1: containment
    of the smaller side is 1.0 while Jaccard is far below any dedup
    threshold — the exact case this tier exists for."""
    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"filler{i} pad{i} word{i}" for i in range(40))
    texts = [
        quote,  # doc 0: the short original
        filler + " " + quote,  # doc 1: long doc embedding the quote
        "completely unrelated text about spark shuffles and parquet files here",
    ]
    sf = _fixture_dir(tmp_path, {"documents": _docs_table(texts)})
    spec = all_queries()["dedup_containment_pairs"]
    rows = {(r.id_a, r.id_b): r for r in spec.fn(spark, sf).collect()}
    assert (0, 1) in rows, f"quote pair missing: {list(rows)}"
    r = rows[(0, 1)]
    assert r.containment_micro == 1_000_000  # full containment, exact
    assert r.common == r.min_sh
    # Jaccard on the same pair is low — the structural contrast
    jac = r.common / (r.min_sh + (r.common + 120) - r.common)
    assert jac < 0.5
    ok, msg = compare(spark, spec, sf)
    assert ok, msg


def test_containment_integer_surface(spark, sf_smoke):
    from big_data_tools_spark.operators.cache import release_all_caches

    df = all_queries()["dedup_containment_pairs"].fn(spark, sf_smoke)
    try:
        types = dict(df.dtypes)
        assert types["containment_micro"] == "bigint"
        assert types["common"] == "bigint"
        for r in df.limit(50).collect():
            assert 900_000 <= r.containment_micro <= 1_000_000
            assert r.common <= r.min_sh
    finally:
        # leaked persists poison later plan-shape tests: a second
        # containment_pairs call half-matches the CacheManager and its
        # explain doubles the cap subtree (seen as a flaky
        # test_containment_no_cartesian in the full-suite order)
        release_all_caches()


# ---------------------------------------------------------- FD audit
def test_fd_audit_planted_violations(spark, tmp_path):
    """Planted orders: the key FD certifies (0 violating groups);
    o_custkey->o_orderpriority violates in exactly one group."""
    d = datetime.datetime(2024, 1, 1)
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([10, 10, 20, 20], pa.int64()),
            "o_orderstatus": pa.array(["O", "O", "F", "F"]),
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0]),
            "o_orderdate": pa.array([d, d, d, d], pa.timestamp("us")),
            # custkey 10 spans two priorities (violates), 20 does not
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "3-MEDIUM"]),
        }
    )
    sf = _fixture_dir(tmp_path, {"orders": orders})
    spec = all_queries()["orders_fd_violations"]
    rows = {r.fd: r for r in spec.fn(spark, sf).collect()}
    key = rows["o_orderkey->o_custkey"]
    assert key.violating_groups == 0 and key.n_groups == 4
    cust = rows["o_custkey->o_orderpriority"]
    assert cust.n_groups == 2
    assert cust.violating_groups == 1
    assert cust.max_rhs_values == 2
    assert cust.violating_rows == 2
    ok, msg = compare(spark, spec, sf)
    assert ok, msg


# ----------------------------------------------------------- hubness
def test_hubness_planted_hub_and_antihub(spark, tmp_path):
    """3 orthogonal 9-member clusters + a hub at the mean direction
    (cos ~0.577 to every member -> fills every member's 10th slot) +
    an anti-hub on its own axis (cos 0 to everything -> in nobody's
    list). k-occurrence must show k_occ=27 for the hub and a nonzero
    k_occ=0 bucket."""
    dim = 8
    vecs, labels = [], []
    for c in range(3):  # clusters on axes 0,1,2
        base = [0.0] * dim
        base[c] = 1.0
        for _ in range(9):
            vecs.append(list(base))
            labels.append(c)
    hub = [0.0] * dim
    s = 1.0 / (3 ** 0.5)
    hub[0] = hub[1] = hub[2] = s
    vecs.append(hub)
    labels.append(3)
    anti = [0.0] * dim
    anti[7] = 1.0
    vecs.append(anti)
    labels.append(4)
    emb = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    sf = _fixture_dir(tmp_path, {"embeddings": emb})
    spec = all_queries()["embedding_hubness_audit"]
    hist = {r.k_occ: r.n_vectors for r in spec.fn(spark, sf).collect()}
    assert sum(hist.values()) == 29  # every vector lands in one bucket
    assert hist.get(27) == 1, f"hub bucket wrong: {hist}"  # the hub
    assert hist.get(0, 0) >= 1  # the anti-hub
    ok, msg = compare(spark, spec, sf)
    assert ok, msg


def test_hubness_buckets_partition_corpus(spark, sf_smoke):
    df = all_queries()["embedding_hubness_audit"].fn(spark, sf_smoke)
    rows = df.collect()
    total = sum(r.n_vectors for r in rows)
    n = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").count()
    assert total == n
    assert all(r.k_occ >= 0 for r in rows)


# ------------------------------------------------------------- ANOVA
def test_anova_planted_group_separation(spark, tmp_path):
    """Two groups with means 10 vs 1000 and tiny within-variance must
    yield a huge F and eta^2 ~ 1; the same values pooled into ONE
    group must emit nothing (k > 1 guard)."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    vals_a = [10.0, 10.5, 9.5, 10.2, 9.8]
    vals_b = [1000.0, 1000.5, 999.5, 1000.2, 999.8]
    n = len(vals_a) + len(vals_b)
    events = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([ts] * n, pa.timestamp("us")),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(["a"] * 5 + ["b"] * 5),
            "value": pa.array(vals_a + vals_b),
            "props": pa.array(["{}"] * n),
        }
    )
    sf = _fixture_dir(tmp_path, {"events": events})
    spec = all_queries()["events_value_anova"]
    row = spec.fn(spark, sf).collect()[0]
    assert row.n_groups == 2 and row.n_events == 10
    assert row.f_stat > 1_000_000  # complete separation
    assert row.eta_sq > 0.999
    ok, msg = compare(spark, spec, sf)
    assert ok, msg


def test_anova_single_group_emits_nothing(spark, tmp_path):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    events = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array([ts] * 4, pa.timestamp("us")),
            "user_id": pa.array([0, 1, 0, 1], pa.int64()),
            "event_type": pa.array(["only"] * 4),
            "value": pa.array([1.0, 2.0, 3.0, 4.0]),
            "props": pa.array(["{}"] * 4),
        }
    )
    sf = _fixture_dir(tmp_path, {"events": events})
    spec = all_queries()["events_value_anova"]
    assert spec.fn(spark, sf).count() == 0
    ok, msg = compare(spark, spec, sf)  # both engines agree: empty
    assert ok, msg


def test_containment_prefix_equals_uncapped_posting(spark, sf_smoke):
    """The exact prefix route (the >20k-doc scale path) must produce
    exactly the posting-list path's pairs when the df cap is off —
    same completeness, same integer scores."""
    from big_data_tools_spark.operators.cache import release_all_caches
    from big_data_tools_spark.operators.dedup import (
        containment_pairs,
        containment_prefix_pairs,
    )

    d = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    try:
        a = {
            (r.id_a, r.id_b): (r.common, r.min_sh, r.containment_micro)
            for r in containment_pairs(
                d, "text", "doc_id", max_doc_freq=None
            ).collect()
        }
        b = {
            (r.id_a, r.id_b): (r.common, r.min_sh, r.containment_micro)
            for r in containment_prefix_pairs(d, "text", "doc_id").collect()
        }
        assert a == b
        assert a  # nonempty on the synthetic corpus
    finally:
        release_all_caches()


def test_containment_prefix_finds_planted_quote(spark):
    """The exact prefix variant (the natural-corpus exactness option)
    must surface the planted full-quote pair at containment 1.0."""
    import importlib

    # the operators package exports a `dedup` FUNCTION, which shadows
    # the module under plain `import ... as`; resolve the module itself
    dd = importlib.import_module("big_data_tools_spark.operators.dedup")
    from big_data_tools_spark.operators.cache import release_all_caches

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"filler{i} pad{i} word{i}" for i in range(40))
    texts = [quote, filler + " " + quote] + [
        f"unrelated text number {i} about spark shuffles parquet files {i}"
        for i in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    try:
        rows = {
            (r.id_a, r.id_b): r
            for r in dd.containment_prefix_pairs(df, "text", "doc_id").collect()
        }
        assert (0, 1) in rows
        assert rows[(0, 1)].containment_micro == 1_000_000
    finally:
        release_all_caches()
