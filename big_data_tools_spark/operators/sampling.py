"""Deterministic sampling operators for training-data pipelines.

``df.sample``/``sampleBy`` seed per-partition RNG streams, so results
change whenever partitioning changes — unacceptable for reproducible
dataset curation. These operators decide membership from a hash of the
ROW'S OWN KEY: the same row lands in the same split on any cluster
layout, any partition count, any engine run. No shuffle — sampling is
a narrow filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "s0") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash. Deterministic
    per (key, salt); change ``salt`` for an independent draw."""
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(_BUCKETS))
    return df.filter(bucket < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (class rebalancing): keep
    ~``fractions[stratum]`` of each stratum's rows (strata absent from
    the dict are dropped). One narrow filter — the fraction map becomes
    a literal map expression, no join, no shuffle, layout-independent.
    """
    frac_map = F.create_map(
        *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(_BUCKETS))
    # element_at, not getItem: a Column key to getItem is deprecated
    # since Spark 3.0 (FutureWarning); both return NULL on missing keys
    thresh = (F.element_at(frac_map, F.col(strata_col)) * _BUCKETS).cast("long")
    return df.filter(bucket < F.coalesce(thresh, F.lit(0)))


def mixture_rebalance_plan(
    df: DataFrame, strata_col: str, targets: dict[str, float]
) -> DataFrame:
    """Per-stratum keep fractions that downsample a corpus to a target
    domain mixture (the "data mixture" step of every pretraining run —
    fixed-weight version of DoReMi-style reweighting).

    With target shares t_s and stratum counts n_s, the largest corpus
    honoring the mixture without upsampling keeps M = min_s(n_s / t_s)
    rows, so keep_frac_s = t_s * M / n_s (strata absent from
    ``targets`` drop to 0). Feed the result to
    :func:`stratified_hash_sample` for the deterministic sample itself.

    One grouped count, then the scalar min rides a 1-row broadcast
    cross join (distributed-scalar pattern, operators/scalar.py) — no
    driver round-trip, no full-data shuffle beyond the count.
    """
    tgt_map = F.create_map(
        *[x for k, v in targets.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_rows"))
    with_tgt = counts.withColumn(
        "tgt", F.coalesce(tgt_map[F.col(strata_col)], F.lit(0.0))
    )
    cap = with_tgt.filter(F.col("tgt") > 0).agg(
        F.min(F.col("n_rows") / F.col("tgt")).alias("cap")
    )
    return (
        with_tgt.crossJoin(F.broadcast(cap))
        .select(
            strata_col,
            "n_rows",
            F.when(
                F.col("tgt") > 0, (F.col("tgt") * F.col("cap")) / F.col("n_rows")
            )
            .otherwise(F.lit(0.0))
            .alias("keep_frac"),
        )
        .withColumn(
            "expected_rows",
            F.floor(F.col("n_rows") * F.col("keep_frac")).cast("bigint"),
        )
    )


def train_test_split_by_key(
    df: DataFrame, key_col: str, test_fraction: float = 0.3, salt: str = "split0"
) -> tuple[DataFrame, DataFrame]:
    """Leakage-safe split: all rows sharing a key land on the same
    side (group-aware splitting — the property randomSplit lacks)."""
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(_BUCKETS))
    cut = int(test_fraction * _BUCKETS)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def hash_topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    salt: str = "s0",
) -> DataFrame:
    """EXACTLY-k-per-group deterministic sample: rank each group's rows
    by md5(key || salt) and keep the first ``k``.

    The fraction-based samplers above keep ~fraction per group but
    cannot promise an exact count; balanced-dataset curation ("2000
    docs per language") needs exact k. Hash ordering gives a
    uniform-ish, layout-independent, engine-reproducible draw (md5,
    not xxhash64, so a DuckDB oracle can rank the identical bytes).
    One window shuffle on the group keys; change ``salt`` for an
    independent draw.
    """
    from pyspark.sql.window import Window

    order = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(*group_cols).orderBy(order.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def shuffle_shards(
    df: DataFrame, key_col: str, n_shards: int, salt: str = "s0"
) -> DataFrame:
    """Deterministic global shuffle + sharding for training export.

    Training runs want the corpus in a reproducible pseudo-random
    order, split into fixed shards, independent of source file layout.
    Hash ordering delivers all three: ``shard_id`` = first bytes of
    md5(key || salt) mod n_shards, ``shard_pos`` = rank of the same
    digest WITHIN the shard. Changing ``salt`` reshuffles; same inputs
    always produce the same (shard_id, shard_pos).

    Scale shape: one window shuffle partitioned BY SHARD — there is no
    global sort; each shard orders independently, so parallelism is
    n_shards regardless of corpus size (size n_shards to the cluster).
    md5 (not xxhash64) so a DuckDB oracle reproduces the bytes.
    """
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    shard = F.pmod(F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"), n_shards)
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard_id").orderBy(
        F.col("__digest").asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__digest", digest)
        .withColumn("shard_id", shard.cast("int"))
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .drop("__digest")
    )


def md5_uniform(key, salt: str = "u0"):
    """Deterministic uniform in (0, 1] from a row key — the
    engine-PORTABLE counterpart of the xxhash64 bucket draws above
    (DuckDB replays md5 exactly; xxhash64 is Spark-specific). Uses 13
    hex chars (52 bits) so the integer stays exactly representable in
    a double on engines that sum hex nibbles in floating point."""
    h = F.conv(F.substring(F.md5(F.concat_ws("|", key, F.lit(salt))), 1, 13), 16, 10)
    return (h.cast("double") + 1.0) / float((1 << 52) + 1)


# 16^(12-i) for i = 0..12 as EXACT literals (powers of two, exactly
# representable): the old `16.0 ** (12 - i)` went through libm pow,
# which is not guaranteed correctly rounded even for exact results —
# one flipped ulp would move split-assignment draws across the 0.7
# boundary engine-dependently (r7 float-policy hardening).
_HEX_PLACE_VALUES = "[" + ", ".join(
    f"{float(16 ** (12 - i)):.1f}" for i in range(13)
) + "]"


def sql_md5_uniform(key_expr: str, salt: str = "u0") -> str:
    """DuckDB twin of :func:`md5_uniform` (hex digits summed
    positionally — all values < 2^53, exact in doubles)."""
    return (
        "((list_sum(list_transform(range(13), i -> "
        f"(strpos('0123456789abcdef', substr(md5({key_expr} || '|{salt}'), "
        f"CAST(i + 1 AS INTEGER), 1)) - 1) * {_HEX_PLACE_VALUES}[CAST(i + 1 AS INTEGER)])) + 1.0) "
        f"/ {float((1 << 52) + 1)!r})"
    )


# The md5 draw as an exact 52-bit INTEGER h+1 in [1, 2^52] — the form
# portable transcendental twins need (pln takes BIGINT args). Value
# (not syntax) parity with the Spark conv() path: both integers are
# < 2^53 so every intermediate is exact.
MD5_DENOM = (1 << 52) + 1


def md5_hp(key, salt: str = "u0"):
    """Spark column: the md5 52-bit integer + 1 (so ln args are >= 1);
    md5_uniform(key) == md5_hp(key) / (2^52 + 1) exactly."""
    h = F.conv(F.substring(F.md5(F.concat_ws("|", key, F.lit(salt))), 1, 13), 16, 10)
    return h.cast("bigint") + 1


def sql_md5_hp(key_expr: str, salt: str = "u0") -> str:
    """DuckDB twin of :func:`md5_hp`."""
    return (
        "CAST(list_sum(list_transform(range(13), i -> "
        f"(strpos('0123456789abcdef', substr(md5({key_expr} || '|{salt}'), "
        f"CAST(i + 1 AS INTEGER), 1)) - 1) * {_HEX_PLACE_VALUES}[CAST(i + 1 AS INTEGER)])) + 1 "
        "AS BIGINT)"
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "w0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the
    Efraimidis–Spirakis one-pass reservoir key (IPL 2006): each row
    draws key = ln(u)/w with u uniform from its own id hash, and the
    k LARGEST keys are the sample — inclusion probability
    proportional to weight, exactly one pass, no RNG state.

    Scale shape: a narrow projection + TakeOrderedAndProject
    (per-partition top-k, k-row driver merge — no global sort); the
    draw is the portable md5 uniform, so the selection is identical on
    any partitioning, any engine. Ties break by id. Rows with
    non-positive weight are excluded (they cannot be sampled).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from .portablemath import pln_sql

    # ln(u) = ln((h+1)/(2^52+1)) = pln(h+1) - pln(2^52+1): integer-arg
    # portable ln (r7 float policy — libm ln drifts a ulp per engine)
    ln_u = F.expr(pln_sql("__hp")) - F.expr(pln_sql(str(MD5_DENOM)))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__hp", md5_hp(F.col(id_col), salt))
        .withColumn("sample_key", F.round(ln_u / F.col(weight_col), 10))
        .drop("__hp")
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def temperature_mixture_plan(
    df: DataFrame,
    group_col: str,
    tau: float = 3.0,
) -> DataFrame:
    """Temperature-based mixture rebalancing plan (the multilingual
    pretraining recipe — Conneau et al., XLM-R 2020: sample groups
    with probability proportional to share^(1/tau), tau > 1 upweights
    tail languages). Returns per group: n_rows, share, target_share,
    and target_n (the rounded row budget). One grouped count + a
    broadcast 1-row normalizer — no data movement beyond the count.

    Compose with :func:`hash_sample` (rate = target_n / n_rows) to
    materialize the plan deterministically.
    """
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    from .cache import track_cache

    # |groups| rows; persist so the total, the normalizer, and the
    # final projection share one scan of df
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows")).persist()
    tot = counts.agg(
        F.sum("n_rows").alias("total"),
    )
    # share^(1/tau) = exp((ln n - ln total)/tau) via the portable
    # no-libm ln/exp (r7 float policy: F.pow vs DuckDB ** disagreed in
    # the last ulp), integer-argument ln on both engines. The exponent
    # is BOUND to a column first: pexp textually expands its argument
    # ~26x, so inlining the (already ~35 KB) pln difference would blow
    # the expression tree into megabytes (measured 5.9 MB -> OOM).
    from .portablemath import pexp_sql, pln_sql

    x = f"({pln_sql('n_rows')} - {pln_sql('total')}) / {float(tau)!r}E0"
    powed = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("__x", F.expr(x))
        .withColumn("p_raw", F.expr(pexp_sql("__x")))
        .drop("__x")
    )
    # order-independent normalizer: quantize each share-power, sum as
    # exact decimals (functions/agg policy), divide at the end
    z = powed.agg(
        F.sum(F.round(F.col("p_raw"), 9).cast("decimal(28,12)"))
        .cast("double")
        .alias("z")
    )
    out = (
        powed.crossJoin(F.broadcast(z))
        .select(
            group_col,
            "n_rows",
            F.round(F.col("n_rows") / F.col("total"), 6).alias("share"),
            F.round(F.round(F.col("p_raw"), 9) / F.col("z"), 6).alias(
                "target_share"
            ),
            F.round(
                F.col("total") * F.round(F.col("p_raw"), 9) / F.col("z"), 0
            )
            .cast("bigint")
            .alias("target_n"),
        )
    )
    return track_cache(out, counts)


# Poisson(1) inverse CDF breakpoints, cumulative P(X <= k). Shared
# double literals between the Spark expression and the DuckDB twin:
# both engines compare the SAME md5 uniform against the SAME bits, so
# bootstrap weights are engine-identical. P(X > 8) < 1.2e-6; the tail
# clamps to 9.
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
)


def poisson1_weight(u):
    """Deterministic Poisson(1) draw from a uniform — the per-row
    resampling weight of the POISSON BOOTSTRAP (the scale-correct
    bootstrap: no global resample indices, one independent weight per
    (row, replicate), trivially distributed; Chamandy et al. 2012,
    "Estimating Uncertainty for Massive Data Streams", Google TR).
    Inverse-CDF via a fixed when-chain over shared double literals."""
    expr = F.lit(9)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        expr = F.when(u <= F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(expr)
    return expr.cast("int")


def sql_poisson1_weight(u_expr: str) -> str:
    """DuckDB twin of :func:`poisson1_weight` — identical breakpoint
    literals (rendered via repr, bit-exact round-trip)."""
    cases = " ".join(
        f"WHEN ({u_expr}) <= {cdf!r} THEN {k}" for k, cdf in enumerate(_POIS1_CDF)
    )
    return f"(CASE {cases} ELSE 9 END)"


def cms_positions(key, depth: int, width: int, salt_prefix: str = "cms"):
    """Explode column of the ``depth`` Count-Min sketch cell positions
    of a row key: (r, b) structs with b = md5_hp(key, '<prefix><r>') %
    width — the portable hash family shared by the batch CMS query,
    its DuckDB twin, and the streaming sketch monitor (one definition,
    so partial sketches from any of them merge by cell addition)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    F.pmod(
                        md5_hp(key.cast("string"), f"{salt_prefix}{r}"),
                        F.lit(width),
                    ).alias("b"),
                )
                for r in range(depth)
            ]
        )
    )
