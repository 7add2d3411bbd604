"""Skew-mitigation operators (SURVEY.md §4.4 scale rules).

AQE's skew-join splitting handles joins; *aggregations* over
low-cardinality or power-law keys still funnel each hot key through a
single reducer. ``salted_aggregate`` does the classic two-phase fix:
pre-aggregate on (key, salt) to spread each hot key over N reducers,
then merge the partials. Works for any algebraic aggregate (sum /
count / min / max) — results are exactly equal to the direct groupBy,
so salted queries remain oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (merge_fn, partial_fn) pairs for algebraic aggregates
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_self_pairs(
    keyed: DataFrame,
    id_col: str = "doc",
    key_col: str = "band_key",
    hot_threshold: int = 1024,
    salt_buckets: int = 8,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs of ids sharing a key, with HOT keys
    split across ``salt_buckets`` reducers.

    The plain self-join on ``key_col`` funnels a key with d rows into
    one task doing O(d^2) work — on boilerplate-heavy corpora a single
    hot LSH band stalls the stage. Keys with more than ``hot_threshold``
    rows are routed through the salted plan: side A gets a stable salt
    ``pmod(xxhash64(id), salt_buckets)``; side B replicates each row
    once per salt value; the join matches on (key, salt). Each (a, b)
    pair meets exactly once (at b's replica carrying a's salt), so the
    candidate set — and therefore recall — is IDENTICAL to the direct
    join; per-task work drops from d^2 to d^2/salt_buckets. Cold keys
    take the direct join (no replication cost). Same two-phase idea as
    :func:`salted_aggregate`, adapted to self-join pair generation.

    Output: (id_a, id_b) distinct, id_a < id_b. Input frame is
    persisted internally (three consumers); caller releases via
    ``big_data_tools_spark.operators.cache.release_caches`` on the
    returned frame.
    """
    from .cache import track_cache

    keyed = keyed.select(F.col(id_col).alias("__id"), F.col(key_col).alias("__key")).persist()
    freq = keyed.groupBy("__key").agg(F.count(F.lit(1)).alias("__n"))
    hot_keys = F.broadcast(freq.filter(F.col("__n") > hot_threshold).select("__key"))

    cold = keyed.join(hot_keys, "__key", "left_anti")
    a, b = cold.alias("a"), cold.alias("b")
    cold_pairs = a.join(
        b, (F.col("a.__key") == F.col("b.__key")) & (F.col("a.__id") < F.col("b.__id"))
    ).select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))

    hot_rows = keyed.join(hot_keys, "__key")
    ha = hot_rows.select(
        "__key",
        F.col("__id").alias("__ida"),
        (F.abs(F.xxhash64("__id")) % salt_buckets).alias("__salt"),
    )
    hb = hot_rows.select(
        "__key",
        F.col("__id").alias("__idb"),
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>")).alias(
            "__salt"
        ),
    )
    hot_pairs = (
        ha.join(hb, ["__key", "__salt"])
        .filter(F.col("__ida") < F.col("__idb"))
        .select(F.col("__ida").alias("id_a"), F.col("__idb").alias("id_b"))
    )
    out = cold_pairs.unionByName(hot_pairs).dropDuplicates(["id_a", "id_b"])
    return track_cache(out, keyed)


def with_boilerplate_hotband(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    every_n: int = 10,
    n_tokens: int = 120,
) -> DataFrame:
    """Skew STRESS FIXTURE (r2 VERDICT ask #5): replace every
    ``every_n``-th document's text with shared boilerplate plus a tiny
    doc-specific tail. The affected docs' shingle sets are near-
    identical, so they produce the same MinHash signature and pile
    behind ONE set of LSH band keys — the realistic worst case
    (licence headers, templated pages) where an unsalted band
    self-join funnels d^2/2 candidate pairs through a single reducer.
    Deterministic (keyed on ``id_col``), so salted-vs-unsalted pair
    sets are comparable run to run."""
    # distinct tokens (not periodic): ~n_tokens distinct shingles per
    # doc, so the doc-specific tail moves pairwise Jaccard only from
    # 1.0 to ~0.95 — comfortably above any sane near-dup threshold
    boiler = " ".join(f"boiler{i}" for i in range(n_tokens))
    hot = F.col(id_col) % every_n == 0
    text = F.when(
        hot,
        F.concat(F.lit(boiler + " tail "), F.col(id_col).cast("string")),
    ).otherwise(F.col(text_col))
    return df.withColumn(text_col, text)


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (kind, column) with kind in
    sum/count/min/max. Phase 1 groups by (keys..., salt) where salt =
    a stable per-row bucket; phase 2 merges partials by keys. The salt
    must be deterministic (hash of a high-cardinality column, not
    rand()) so results are reproducible run to run.

    ``salt_cols`` names the column(s) the salt hashes — pass one
    high-cardinality column (a row id / natural key). Defaults to every
    column, which is correct but reads the full row width: with an
    explicit salt column the scan stays pruned to keys + agg inputs +
    salt (PLANS.md evidences the difference).
    """
    for name, (kind, _) in aggs.items():
        if kind not in _MERGES:
            raise ValueError(f"{name}: unsupported aggregate kind {kind!r}")

    salt = (F.abs(F.xxhash64(*(salt_cols or df.columns))) % salt_buckets).alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            (F.count(col) if kind == "count" else getattr(F, kind)(col)).alias(f"__p_{name}")
            for name, (kind, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGES[kind](F.col(f"__p_{name}")).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )
