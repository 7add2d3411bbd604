"""Scale-technique queries: skew-safe aggregation, approximate
sketches, multimodal plumbing — the 100 TB toolbox demonstrated on
driver data. Salted aggregation is exactly equal to the direct form,
so it keeps a DuckDB oracle twin; sketch/multimodal entries are
rows-only by nature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from ..operators.portablemath import pln_sql as _pln
from ..operators.sampling import MD5_DENOM as _MD5_DENOM
from ..operators.sampling import sql_md5_hp as _sql_md5_hp
from ..operators.sampling import sql_md5_uniform
from ..operators.skew import salted_aggregate
from .registry import register


@register(
    "salted_status_rollup",
    sql="""
    SELECT o_orderstatus,
           CAST(count(o_totalprice) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) + 0.0 AS revenue,
           max(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Skew-safe two-phase aggregation (operators/skew.py): orders "
    "grouped by the 3-value status key — the shape where a hot key "
    "funnels into one reducer — salted across 16 buckets then merged. "
    "Results are exactly the direct groupBy's (oracle-checked).",
)
def salted_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    out = salted_aggregate(
        o,
        keys=["o_orderstatus"],
        aggs={
            "n_orders": ("count", F.col("o_totalprice")),
            "revenue_dec": ("sum", F.col("o_totalprice").cast("decimal(18,2)")),
            "max_price": ("max", F.col("o_totalprice")),
        },
        salt_cols=["o_orderkey"],
    )
    return out.select(
        "o_orderstatus",
        "n_orders",
        F.round(F.col("revenue_dec").cast("double"), 2).alias("revenue"),
        "max_price",
    )


@register(
    "approx_distinct_sketch",
    sql=None,  # HLL sketch values differ engine-to-engine by design
    doc="approx_count_distinct (A8 scale variant): HLL sketches for "
    "customer/part/supplier keys over lineitem in one pass. Sketch "
    "merge is commutative so values are run-to-run deterministic; the "
    "exact twin is the oracle-checked distinct_customer_count. "
    "Rows-only driver check; error band asserted in tests.",
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "multimodal_features",
    sql=None,  # Arrow mapInPandas path; not SQL-expressible
    doc="Multimodal decode (§2.11): binary media column + typed "
    "metadata struct -> Arrow-batched mapInPandas with REAL decoding "
    "(operators/imagecodec.py: pure-stdlib PNG inflate+unfilter, WAV "
    "PCM16, MP4 mvhd; PIL preferred when installed) — decoded "
    "width/height/duration and pixel/signal statistics, not fakes. "
    "The feature vector stays internal; the registered output "
    "projects per-item scalars (dims, duration, L2 norm, first "
    "component) because the driver's canonicalizer cannot hash "
    "array-valued cells (round-1 doc_length_quantiles_approx lesson). "
    "Rows-only driver check; decoded values pinned against fixture "
    "formulas in tests/test_multimodal.py.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_fake_media, extract_media_features

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_media_features(attach_fake_media(docs), feature_dim=8)
    vec = F.col("feature")
    return feats.select(
        *[c for c in feats.columns if c != "feature"],
        F.size(vec).alias("feature_dim"),
        F.round(
            F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("feature_norm"),
        F.round(vec.getItem(0).cast("double"), 4).alias("feature_0"),
    )


@register(
    "multimodal_video_frames",
    sql=None,  # Arrow mapInPandas 1->N fan-out; not SQL-expressible
    doc="Multimodal frame sampling (§2.11): video rows fan out to one "
    "row per sampled frame inside the Arrow batch, with REAL payload "
    "decode as of round 5 — the container's stts/stsz/mdat sample "
    "table picks the latest PNG sample per instant and the decoded "
    "pixels produce width/height/px_mean (codec coverage is "
    "PNG-in-BMFF; H.264 would need an external decoder). Rows-only "
    "driver check; fan-out counts and exact pixel payloads pinned in "
    "tests/test_multimodal.py.",
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_fake_media, sample_video_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_video_frames(attach_fake_media(docs), every_n_seconds=2.0)


@register(
    "documents_stratified_sample",
    sql=None,  # xxhash64 membership has no DuckDB twin; determinism
    # and per-stratum rates are test-pinned instead
    doc="Deterministic stratified sampling (operators/sampling.py): "
    "per-language keep-fractions decided by xxhash64 of doc_id — "
    "layout-independent (same rows survive under any partitioning), "
    "no shuffle, no RNG streams. The curation primitive random "
    "sample()/sampleBy() cannot provide reproducibly.",
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import stratified_hash_sample

    d = load_table(spark, sf_dir, "documents")
    sampled = stratified_hash_sample(
        d,
        key_col="doc_id",
        strata_col="lang",
        fractions={"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.1},
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "documents_balanced_per_lang",
    sql="""
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || 's0') ASC, doc_id ASC
               ) AS rn
        FROM documents
    ) WHERE rn <= 40
    """,
    doc="Exactly-k-per-group deterministic sampling (north-star "
    "curation): 40 docs per language ranked by md5 of the doc key — "
    "layout-independent and engine-reproducible (the DuckDB oracle "
    "ranks the identical md5 bytes), unlike fraction samplers that "
    "cannot promise exact counts. One window shuffle on the group "
    "key.",
)
def documents_balanced_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_topk_per_group

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return hash_topk_per_group(d, ["lang"], "doc_id", k=40)


@register(
    "observed_rollup_audit",
    sql=None,  # Observation metrics ride accumulators, not a SQL result
    doc="S5 modernized (operators/observe.py): the reference re-scans "
    "its tables nine times for count probes (Databricks Notebook.py:39-"
    "723); df.observe computes row counts / null counts / domain "
    "checks as accumulators DURING the query's own action — zero extra "
    "scans at any scale. Runs the flagship rollup once with an audit "
    "attached and returns the metrics as rows. Rows-only driver check; "
    "metric==direct-aggregation equality asserted in "
    "tests/test_operators.py.",
)
def observed_rollup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.observe import with_audit

    # fork the session for the observed action: Spark 4.1.2's
    # ObservationManager initializes lazily on first observe and is not
    # serializable, which poisons LATER ml-model serialization on the
    # same session (see operators/observe.py docstring). The fork
    # shares the SparkContext; the caller's session stays clean.
    obs_spark = spark.newSession()
    orders = load_table(obs_spark, sf_dir, "orders")
    observed, obs = with_audit(
        orders,
        metrics={
            "n_urgent": F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)),
            "max_price": F.round(F.max("o_totalprice"), 2),
        },
        null_cols=("o_custkey",),
    )
    # the one action everything rides on (any downstream query works;
    # count keeps the demo free of result-shape noise)
    observed.count()
    rows = sorted((k, float(v)) for k, v in obs.get.items())
    return spark.createDataFrame(rows, "metric string, value double")


@register(
    "orders_quality_gate",
    sql="""
    SELECT 'custkey_present' AS check_name,
           CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
               AS violations
    FROM orders
    UNION ALL
    SELECT 'price_positive',
           CAST(count(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
                           THEN 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'status_domain',
           CAST(count(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'),
                                             FALSE) THEN 1 END) AS BIGINT)
    FROM orders
    """,
    doc="Data-quality gate (operators/expectations.py) as a queryable "
    "report: three per-row constraints on orders evaluated as "
    "conditional counts in ONE aggregate pass via the non-raising "
    "constraint_report form (the raising pipeline gate is "
    "check_constraints; the report never throws on dirty data, it "
    "returns the counts — so the driver row survives a future round "
    "shipping violations). The oracle twin re-derives each count "
    "independently, so the single-pass evaluation is provably equal "
    "to one-scan-per-check.",
)
def orders_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.expectations import constraint_report

    orders = load_table(spark, sf_dir, "orders")
    report = constraint_report(
        orders,
        {
            "custkey_present": F.col("o_custkey").isNotNull(),
            "price_positive": F.col("o_totalprice") > 0,
            "status_domain": F.col("o_orderstatus").isin("O", "F", "P"),
        },
    )
    return report.orderBy("check_name")


_SHUFFLE_SHARDS = 8
_SHUFFLE_SALT = "s0"


@register(
    "corpus_shuffle_shards",
    sql=f"""
    WITH d AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR) || '{_SHUFFLE_SALT}') AS dg
        FROM documents
    ), s AS (
        SELECT doc_id, dg,
               CAST(CAST(concat('0x', substring(dg, 1, 8)) AS BIGINT)
                    % {_SHUFFLE_SHARDS} AS INT) AS shard_id
        FROM d
    )
    SELECT doc_id, shard_id,
           CAST(row_number() OVER (PARTITION BY shard_id
                                   ORDER BY dg, doc_id) AS BIGINT) AS shard_pos
    FROM s
    """,
    doc="Deterministic corpus shuffle + sharding for training export "
    "(operators/sampling.py shuffle_shards): md5(key||salt) assigns a "
    "reproducible pseudo-random shard and within-shard order, "
    "independent of input file layout. Scale shape: the only shuffle "
    "is a window PARTITIONED BY SHARD — no global sort task; "
    "parallelism = n_shards at any corpus size. Change the salt to "
    "reshuffle between epochs.",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import shuffle_shards

    out = shuffle_shards(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        n_shards=_SHUFFLE_SHARDS,
        salt=_SHUFFLE_SALT,
    )
    return out.select("doc_id", "shard_id", "shard_pos")


_WS_K = 100
_WS_SALT = "w0"
_TM_TAU = 3.0

from ..operators.portablemath import pexp_sql as _pexp  # noqa: E402

_tm_x = f"({_pln('n_rows')} - {_pln('total')}) / {float(_TM_TAU)!r}E0"
_tm_praw = _pexp("__x")


@register(
    "documents_weighted_sample",
    # ln(u) = pln(h+1) - pln(2^52+1) on the exact md5 integer — the
    # portable no-libm ln (r7 float policy)
    sql=f"""
    SELECT doc_id, n_chars,
           round(({_pln(_sql_md5_hp("CAST(doc_id AS VARCHAR)", _WS_SALT))}
                  - {_pln(str(_MD5_DENOM))})
                 / n_chars, 10) + 0.0 AS sample_key
    FROM documents WHERE n_chars > 0
    ORDER BY sample_key DESC, doc_id ASC LIMIT {_WS_K}
    """,
    doc="Weighted sampling without replacement (Efraimidis-Spirakis "
    "one-pass reservoir key, operators/sampling.py "
    "weighted_sample_topk): key = ln(u)/weight with u drawn "
    "PORTABLY from the row's own md5 (52-bit exact), top-k keys win "
    "— inclusion probability proportional to n_chars. Plans as a "
    "narrow projection + TakeOrderedAndProject; identical selection "
    "on any partitioning and any engine (the DuckDB twin replays the "
    "draw bit-for-bit).",
)
def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_topk(
        docs, weight_col="n_chars", k=_WS_K, id_col="doc_id", salt=_WS_SALT
    )


@register(
    "documents_temperature_mixture",
    sql=f"""
    WITH counts AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_rows
        FROM documents GROUP BY lang
    ), tot AS (SELECT sum(n_rows) AS total FROM counts),
    xb AS (
        -- share^(1/tau) = pexp((pln(n) - pln(total))/tau): portable
        -- no-libm pow (r7 float policy); the exponent binds in its
        -- own CTE because pexp expands its argument ~26x textually
        SELECT lang, n_rows, total, {_tm_x} AS __x
        FROM counts CROSS JOIN tot
    ), powed AS (
        SELECT lang, n_rows, total, {_tm_praw} AS p_raw FROM xb
    ), z AS (
        SELECT CAST(sum(CAST(round(p_raw, 9) AS DECIMAL(28,12))) AS DOUBLE)
                   AS z
        FROM powed
    )
    SELECT lang, n_rows,
           round(n_rows * 1.0 / total, 6) AS share,
           round(round(p_raw, 9) / z.z, 6) AS target_share,
           CAST(round(total * round(p_raw, 9) / z.z, 0) AS BIGINT) AS target_n
    FROM powed CROSS JOIN z
    """,
    doc="Temperature-based language rebalancing plan (XLM-R recipe, "
    "Conneau et al. 2020; operators/sampling.py "
    "temperature_mixture_plan): per-language sampling budget "
    "proportional to share^(1/tau) with tau=3 upweighting tail "
    "languages. One grouped count, two broadcast 1-row normalizers, "
    "order-independent decimal normalizer sum; compose with "
    "hash_sample to materialize deterministically.",
)
def documents_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import temperature_mixture_plan

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mixture_plan(docs, "lang", tau=_TM_TAU)


@register(
    "multimodal_audio_resample",
    sql=None,  # binary media transform; content pinned in tests
    doc="REAL audio resampling (operators/multimodal.py "
    "resample_audio): PCM16 WAV decoded with the pure-stdlib codec, "
    "linear-interpolated to 16 kHz with numpy inside the Arrow "
    "mapInPandas batch, re-encoded WAV. The audio-type filter is "
    "pushed before the Python stage. Rows-only driver check; decoded "
    "duration preservation and interpolation exactness on a known "
    "triangle wave are pinned in tests/test_multimodal.py.",
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_fake_media, resample_audio

    docs = load_table(spark, sf_dir, "documents").limit(200)
    media = attach_fake_media(docs, id_col="doc_id")
    return resample_audio(media, target_rate=16000)


_STRAT_FRACS = (("en", 0.5), ("de", 0.25), ("fr", 0.25), ("es", 0.25), ("zh", 0.1))
_STRAT_SALT = "strat"


@register(
    "documents_stratified_portable",
    sql=f"""
    WITH drawn AS (
        SELECT doc_id, lang,
               {sql_md5_uniform('CAST(doc_id AS VARCHAR)', _STRAT_SALT)} AS u
        FROM documents
    ), kept AS (
        SELECT doc_id, lang FROM drawn
        WHERE u <= CASE lang
            {' '.join(f"WHEN '{lang}' THEN {f}" for lang, f in _STRAT_FRACS)}
            ELSE 0.0 END
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
           min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM kept GROUP BY lang
    """,
    doc="Engine-PORTABLE stratified sampling: per-language keep "
    "fractions decided by the md5 uniform draw of doc_id "
    "(operators/sampling.py md5_uniform — 52-bit, exactly "
    "reproducible in DuckDB), giving the production xxhash64 variant "
    "(documents_stratified_sample) a hash-checkable twin with "
    "identical semantics: layout-independent membership, no shuffle, "
    "no RNG streams, same rows survive under any partitioning or "
    "engine. The md5 draw costs ~2x xxhash64 per row; both are "
    "scan-local, so the production path keeps xxhash64 and this "
    "portable path carries the oracle signal (the "
    "dedup_minhash_portable pattern).",
)
def documents_stratified_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import md5_uniform

    d = load_table(spark, sf_dir, "documents")
    frac = F.lit(0.0)
    for lang, f in _STRAT_FRACS:
        frac = F.when(F.col("lang") == lang, F.lit(f)).otherwise(frac)
    kept = d.filter(
        md5_uniform(F.col("doc_id").cast("string"), _STRAT_SALT) <= frac
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


_KMV_K = 128
_KMV_SALT = "kmv0"


def _kmv_sql() -> str:
    u = sql_md5_uniform("CAST(user_id AS VARCHAR)", _KMV_SALT)
    k = _KMV_K
    return f"""
    WITH users AS (
        SELECT DISTINCT user_id FROM events
    ), hashed AS (
        SELECT user_id, {u} AS u FROM users
    ), kmin AS (
        SELECT u FROM hashed ORDER BY u ASC LIMIT {k}
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS k_eff, max(u) AS kth FROM hashed
        WHERE u <= (SELECT max(u) FROM kmin)
    ), ex AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM users
    ), tu AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), per_type AS (
        SELECT event_type, user_id,
               {sql_md5_uniform("CAST(user_id AS VARCHAR)", _KMV_SALT)} AS u,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY {sql_md5_uniform("CAST(user_id AS VARCHAR)", _KMV_SALT)} ASC,
                            user_id ASC
               ) AS rn
        FROM tu
    ), merged AS (
        SELECT DISTINCT u FROM per_type WHERE rn <= {k}
    ), mk AS (
        SELECT max(u) AS kth_merged
        FROM (SELECT u FROM merged ORDER BY u ASC LIMIT {k})
    )
    SELECT s.k_eff, s.kth AS kth_min,
           CASE WHEN s.k_eff < {k} THEN CAST(ex.exact_distinct AS DOUBLE)
                ELSE (s.k_eff - 1) / s.kth END AS est_distinct,
           ex.exact_distinct,
           CASE WHEN s.k_eff < {k} THEN 0.0
                ELSE (s.k_eff - 1) / s.kth / ex.exact_distinct - 1.0
           END AS rel_error,
           (mk.kth_merged = s.kth) AS merge_identity_ok
    FROM s CROSS JOIN ex CROSS JOIN mk
    """


@register(
    "events_user_kmv_distinct",
    sql=_kmv_sql(),
    doc=f"KMV (k-minimum-values) distinct-count sketch for event "
    f"users, k={_KMV_K} (Bar-Yossef et al. 2002; the Theta-sketch "
    "core): estimate = (k-1)/u_(k) over the k smallest portable-md5 "
    "uniforms. The rare thing here is the ORACLE TWIN — HLL sketches "
    "differ engine-to-engine by design (approx_distinct_sketch is "
    "rows-only for exactly that reason), but KMV over the repo's "
    "portable md5 uniform is a pure deterministic function of the "
    "key set, so DuckDB reproduces the sketch, the estimate, and the "
    "relative error bit-for-bit. The query also PROVES the sketch's "
    "mergeability on real data: per-event-type partial sketches "
    "(bounded rank windows) union-merge to the identical global "
    "k-min (`merge_identity_ok`) — the property that lets partial "
    "sketches roll up map-side at 100 TB instead of re-scanning raw "
    "keys. Scale shape: one distinct shuffle, a TakeOrdered for the "
    "k-min (no global sort), and |event_types| bounded rank windows "
    "at the (type, user) grain; when the true cardinality is below "
    "k the sketch IS exact and both engines report rel_error 0.",
)
def events_user_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.sampling import md5_uniform

    k = _KMV_K
    events = load_table(spark, sf_dir, "events")
    u_of = lambda: md5_uniform(F.col("user_id").cast("string"), _KMV_SALT)  # noqa: E731
    hashed = (
        events.select("user_id").distinct().select("user_id", u_of().alias("u"))
        .persist()
    )
    kth_frame = (
        hashed.orderBy(F.asc("u")).limit(k).agg(F.max("u").alias("kth_cut"))
    )
    # k_eff recounted against the cutoff (ties on u are the same user
    # hash, so both engines keep the identical set)
    s = hashed.crossJoin(F.broadcast(kth_frame)).filter(
        F.col("u") <= F.col("kth_cut")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("k_eff"),
        F.max("u").alias("kth"),
    )
    ex = hashed.agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    tu = events.select("event_type", "user_id").distinct()
    w = Window.partitionBy("event_type").orderBy(F.asc("u"), F.asc("user_id"))
    per_type = tu.select("event_type", "user_id", u_of().alias("u")).select(
        "u", F.row_number().over(w).alias("rn")
    )
    merged = per_type.filter(F.col("rn") <= k).select("u").distinct()
    mk = (
        merged.orderBy(F.asc("u")).limit(k).agg(F.max("u").alias("kth_merged"))
    )
    est = F.when(
        F.col("k_eff") < k, F.col("exact_distinct").cast("double")
    ).otherwise((F.col("k_eff") - 1) / F.col("kth"))
    rel = F.when(F.col("k_eff") < k, F.lit(0.0)).otherwise(
        (F.col("k_eff") - 1) / F.col("kth") / F.col("exact_distinct") - 1.0
    )
    from ..operators.cache import track_cache

    out = (
        s.crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(mk))
        .select(
            "k_eff",
            F.col("kth").alias("kth_min"),
            est.alias("est_distinct"),
            "exact_distinct",
            rel.alias("rel_error"),
            (F.col("kth_merged") == F.col("kth")).alias("merge_identity_ok"),
        )
    )
    return track_cache(out, hashed)


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

_CMS_D = 4       # sketch depth (independent hash rows)
_CMS_W = 512     # sketch width (buckets per row)
_CMS_TOP = 10    # heavy hitters reported


def _cms_pos_sql(src: str, key: str, extra: str = "") -> str:
    """UNION ALL branches enumerating the d salted bucket positions of
    ``key`` — the SQL mirror of the Spark explode-of-salted-array."""
    sel = ", " if extra else ""
    branches = [
        f"SELECT {extra}{sel}{r} AS r, "
        f"{_sql_md5_hp(f'CAST({key} AS VARCHAR)', f'cms{r}')} % {_CMS_W} AS b "
        f"FROM {src}"
        for r in range(_CMS_D)
    ]
    return " UNION ALL ".join(branches)


@register(
    "events_cms_heavy_hitters",
    sql=f"""
    WITH pos AS (
        {_cms_pos_sql("events", "user_id")}
    ), sketch AS (
        SELECT r, b, CAST(count(*) AS BIGINT) AS cnt
        FROM pos GROUP BY r, b
    ), exact AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
        FROM events GROUP BY user_id
    ), top AS (
        SELECT user_id, exact_count FROM exact
        ORDER BY exact_count DESC, user_id ASC LIMIT {_CMS_TOP}
    ), probe AS (
        {_cms_pos_sql("top", "user_id", "user_id, exact_count")}
    ), est AS (
        SELECT p.user_id, p.exact_count,
               CAST(min(s.cnt) AS BIGINT) AS cms_est
        FROM probe p JOIN sketch s ON s.r = p.r AND s.b = p.b
        GROUP BY p.user_id, p.exact_count
    ), typed_pos AS (
        {_cms_pos_sql("events", "user_id", "event_type")}
    ), partials AS (
        SELECT event_type, r, b, CAST(count(*) AS BIGINT) AS cnt
        FROM typed_pos GROUP BY event_type, r, b
    ), merged AS (
        SELECT r, b, CAST(sum(cnt) AS BIGINT) AS cnt
        FROM partials GROUP BY r, b
    ), mi AS (
        SELECT ((SELECT count(*) FROM merged m JOIN sketch s
                 ON s.r = m.r AND s.b = m.b AND s.cnt = m.cnt)
                = (SELECT count(*) FROM sketch))
           AND ((SELECT count(*) FROM merged)
                = (SELECT count(*) FROM sketch)) AS merge_identity_ok
    )
    SELECT e.user_id, e.exact_count, e.cms_est,
           e.cms_est - e.exact_count AS overestimate,
           mi.merge_identity_ok
    FROM est e CROSS JOIN mi
    """,
    doc="Count-Min sketch frequency estimates for the top event users "
    "(Cormode & Muthukrishnan 2005), d=4 rows x w=512 buckets over "
    "the portable md5 hash family — the frequency counterpart of the "
    "KMV cardinality sketch, and like it oracle-twinned exactly "
    "because the sketch is a pure deterministic integer function of "
    "the key stream (CPC/CountSketch variants with RNG seeds never "
    "can be). Emits each heavy hitter's exact count next to its CMS "
    "estimate: the sketch's one-sided error guarantee (estimate >= "
    "truth, always) is visible as overestimate >= 0, pinned in "
    "tests. The query also PROVES the sketch's linearity on real "
    "data: per-event-type partial sketches summed cell-wise equal "
    "the global sketch (merge_identity_ok) — what lets 1000 "
    "executors sketch their shards independently and add the d*w "
    "integer grids at the coordinator instead of re-shuffling raw "
    "keys. Scale shape (r11): one map-side-combined shuffle of the "
    "raw events to (event_type, user_id) counts, then every sketch "
    "(global and per-type) is a 4x explode over that DISTINCT-KEY "
    "grain — the portable md5 runs per distinct user, not per event "
    "— reduced to d*w = 2048 cells regardless of data volume; the "
    "exact top-k (for the audit only) is one re-aggregation of the "
    "same grain + TakeOrdered.",
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import track_cache
    from ..operators.sampling import cms_positions

    events = load_table(spark, sf_dir, "events")

    def positions(key):
        return cms_positions(key, _CMS_D, _CMS_W)

    # r11 (guide §2.3 "aggregate before you shuffle", §1.2 per-task
    # work): the sketch cell positions depend only on user_id, so
    # hashing the raw event stream paid d portable-md5 calls per EVENT
    # — twice (global pos + typed pos), 8x|events| md5s and three full
    # scans. Pre-aggregating to (event_type, user_id) grain first
    # costs one map-side-combined shuffle of |events| narrow rows;
    # every downstream frame (exact counts, global sketch, per-type
    # partials) is then an exact integer re-aggregation of that tiny
    # persisted grain, and md5 runs d times per DISTINCT user /
    # (type, user) pair — 4x(|users| + |type-user|) calls. At sf0.1
    # that is 36k hashes instead of 800k; at 100 TB the ratio is the
    # events-per-user fan-in. Cell counts are identical: count(*) per
    # cell == sum of per-user counts hashing to it.
    tcnt = (
        events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist()
    )
    exact = tcnt.groupBy("user_id").agg(
        F.sum("cnt").cast("bigint").alias("exact_count")
    )
    sketch = (
        exact.select("exact_count", positions(F.col("user_id")).alias("p"))
        .select("exact_count", "p.r", "p.b")
        .groupBy("r", "b")
        .agg(F.sum("exact_count").cast("bigint").alias("cnt"))
        .persist()
    )
    top = exact.orderBy(
        F.desc("exact_count"), F.asc("user_id")
    ).limit(_CMS_TOP)
    probe = top.select(
        "user_id", "exact_count", positions(F.col("user_id")).alias("p")
    ).select("user_id", "exact_count", "p.r", "p.b")
    est = (
        probe.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
    )
    typed = tcnt.select(
        "event_type", "cnt", positions(F.col("user_id")).alias("p")
    ).select("event_type", "cnt", "p.r", "p.b")
    partials = typed.groupBy("event_type", "r", "b").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    merged = partials.groupBy("r", "b").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    n_match = merged.join(sketch, ["r", "b", "cnt"]).agg(
        F.count(F.lit(1)).alias("n_match")
    )
    n_cells = sketch.agg(F.count(F.lit(1)).alias("n_cells"))
    n_merged = merged.agg(F.count(F.lit(1)).alias("n_merged"))
    mi = (
        n_match.crossJoin(F.broadcast(n_cells))
        .crossJoin(F.broadcast(n_merged))
        .select(
            (
                (F.col("n_match") == F.col("n_cells"))
                & (F.col("n_merged") == F.col("n_cells"))
            ).alias("merge_identity_ok")
        )
    )
    out = est.crossJoin(F.broadcast(mi)).select(
        "user_id",
        "exact_count",
        "cms_est",
        (F.col("cms_est") - F.col("exact_count")).alias("overestimate"),
        "merge_identity_ok",
    )
    return track_cache(out, sketch, tcnt)


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction audit (Bloom 1970)
# ---------------------------------------------------------------------------

_BF_M = 8192   # filter bits
_BF_K = 3      # hash functions


def _bf_pos_sql(src: str, key: str, extra: str = "") -> str:
    sel = ", " if extra else ""
    branches = [
        f"SELECT {extra}{sel}"
        f"{_sql_md5_hp(f'CAST({key} AS VARCHAR)', f'bf{j}')} % {_BF_M} AS pos "
        f"FROM {src}"
        for j in range(_BF_K)
    ]
    return " UNION ALL ".join(branches)


@register(
    "bloom_semijoin_audit",
    sql=f"""
    WITH members AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ), mpos AS (
        SELECT DISTINCT pos FROM ({_bf_pos_sql("members", "k")})
    ), probe AS (
        SELECT c_custkey AS k FROM customer
    ), ppos AS (
        SELECT DISTINCT k, pos FROM ({_bf_pos_sql("probe", "k", "k")})
    ), per_key AS (
        SELECT p.k,
               CAST(count(*) AS BIGINT) AS npos,
               CAST(count(m.pos) AS BIGINT) AS matched
        FROM ppos p LEFT JOIN mpos m ON p.pos = m.pos
        GROUP BY p.k
    ), counts AS (
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
            (SELECT CAST(count(*) AS BIGINT) FROM mpos) AS n_bits_set,
            (SELECT CAST(count(*) AS BIGINT) FROM probe) AS n_probe,
            (SELECT CAST(count(*) AS BIGINT) FROM per_key
             WHERE matched = npos) AS n_accepted,
            (SELECT CAST(count(*) AS BIGINT) FROM probe
             WHERE k IN (SELECT k FROM members)) AS n_true
    )
    SELECT CAST({_BF_M} AS BIGINT) AS filter_bits,
           CAST({_BF_K} AS INT) AS k_hashes,
           n_members, n_bits_set, n_probe, n_accepted, n_true,
           n_accepted - n_true AS n_false_pos,
           CASE WHEN n_probe = n_true THEN 0.0
                ELSE round((n_accepted - n_true) * 1.0
                           / (n_probe - n_true), 6) + 0.0 END AS fp_observed,
           round(n_bits_set * n_bits_set * n_bits_set * 1.0
                 / ({_BF_M}.0 * {_BF_M} * {_BF_M}), 6) AS fp_predicted
    FROM counts
    """,
    doc="Bloom-filter semi-join reduction audit (Bloom 1970; the "
    "runtime-filter pattern behind Spark's own "
    "spark.sql.optimizer.runtimeFilter.bloomFilter pushdown): build "
    "an m=8192-bit, k=3 filter over urgent-order customer keys from "
    "the portable md5 hash family, probe every customer, and compare "
    "the filter's accept set against the exact semi-join. At 100 TB "
    "this is THE join-pruning lever: an 8 KiB bit set broadcast to "
    "every scan task prunes the fact side BEFORE the shuffle, and "
    "the false-positive rate printed here is exactly the fraction "
    "of over-read that survives pruning and still pays the join. "
    "No false negatives by construction (members' own bits are "
    "always set — pinned in tests); the observed FP rate sits next "
    "to the load-based prediction (bits_set/m)^k, an exact rational "
    "so both engines agree bit-for-bit. Scale shape: the filter "
    "build is a distinct + bounded grouped set (<= m rows); the "
    "probe is a narrow 3x explode joined to the broadcast position "
    "set — the fact table never shuffles.",
)
def bloom_semijoin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import md5_hp

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def positions(key):
        return F.explode(
            F.array(
                *[
                    F.pmod(md5_hp(key.cast("string"), f"bf{j}"), F.lit(_BF_M))
                    for j in range(_BF_K)
                ]
            )
        )

    def pos_array(key):
        # the 3 hash positions are a pure function of the key; two of
        # them can collide, so distinct-per-key = array_distinct, no
        # (k, pos) exchange needed
        return F.array_distinct(
            F.array(
                *[
                    F.pmod(md5_hp(key.cast("string"), f"bf{j}"), F.lit(_BF_M))
                    for j in range(_BF_K)
                ]
            )
        )

    members = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .persist()
    )
    mpos = members.select(positions(F.col("k")).alias("pos")).distinct()
    # ONE customer scan (was 3: ppos explode, n_probe count, n_true
    # semi-join — guide §2.3 "aggregate before you shuffle" / §1.2):
    # group the probe to distinct keys first, carrying the raw row
    # multiplicity, so n_probe/n_true keep their row grain exactly
    # even if a key ever repeated. Positions explode AFTER the
    # key-grain aggregate (they are a function of k), and the per-key
    # membership flag rides the same frame, so the whole audit pays
    # one probe-side exchange instead of three subtree re-executions.
    probe_keys = (
        cust.select(F.col("c_custkey").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    ppos = probe_keys.select(
        "k", "cnt", F.explode(pos_array(F.col("k"))).alias("pos")
    )
    per_key = (
        ppos.join(
            F.broadcast(mpos.withColumn("hit", F.lit(1))), on="pos", how="left"
        )
        .groupBy("k", "cnt")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("npos"),
            F.count("hit").cast("bigint").alias("matched"),
        )
        .join(members.withColumn("m", F.lit(1)), on="k", how="left")
    )
    n_members = members.agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    n_bits = mpos.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    probe_stats = per_key.agg(
        F.sum("cnt").cast("bigint").alias("n_probe"),
        F.sum(
            F.when(F.col("matched") == F.col("npos"), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_accepted"),
        F.sum(F.when(F.col("m") == 1, F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_true"),
    )
    b = F.col("n_bits_set").cast("double")
    fp_obs = F.when(F.col("n_probe") == F.col("n_true"), F.lit(0.0)).otherwise(
        F.round(
            (F.col("n_accepted") - F.col("n_true"))
            * F.lit(1.0)
            / (F.col("n_probe") - F.col("n_true")),
            6,
        )
    )
    out = (
        n_members.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(probe_stats))
        .select(
            F.lit(_BF_M).cast("bigint").alias("filter_bits"),
            F.lit(_BF_K).cast("int").alias("k_hashes"),
            "n_members",
            "n_bits_set",
            "n_probe",
            "n_accepted",
            "n_true",
            (F.col("n_accepted") - F.col("n_true")).alias("n_false_pos"),
            fp_obs.alias("fp_observed"),
            F.round(
                b * b * b / float(_BF_M) ** 3, 6
            ).alias("fp_predicted"),
        )
    )
    from ..operators.cache import track_cache

    return track_cache(out, members)


# ---------------------------------------------------------------------------
# Mergeable fixed-bin quantile sketch (the equi-width histogram
# estimator; completes the sketch trio: CMS = frequency, KMV =
# cardinality, this = quantiles)
# ---------------------------------------------------------------------------

_QSK_BINS = 64
_QSK_WIDTH_C = 800_000          # cents per bin: 64 x $8000 covers [0, 512k)
_QSK_PERMILLE = (500, 900, 990)  # p50 / p90 / p99
_QSK_PM_SQL = ", ".join(str(p) for p in _QSK_PERMILLE)
_QSK_PREFIX_BKT_C = 1_000_000   # $10k prefix-sum buckets for the exact side


@register(
    "orders_price_quantile_sketch",
    sql=f"""
    WITH vals AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               date_trunc('month', o_orderdate) AS mo
        FROM orders WHERE o_totalprice IS NOT NULL
    ), n AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows FROM vals
    ), targets AS (
        SELECT CAST(unnest([{_QSK_PM_SQL}]) AS BIGINT) AS q_permille
    ), ranks AS (
        SELECT q_permille, n_rows,
               (n_rows * q_permille + 999) // 1000 AS target_rank
        FROM targets CROSS JOIN n
    ), hist AS (
        SELECT least(cents // {_QSK_WIDTH_C}, {_QSK_BINS - 1}) AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM vals GROUP BY 1
    ), hcum AS (
        SELECT bin, cnt,
               CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
        FROM hist
    ), est AS (
        SELECT r.q_permille, r.n_rows, r.target_rank,
               min(h.bin) AS ebin
        FROM ranks r JOIN hcum h ON h.cum >= r.target_rank
        GROUP BY 1, 2, 3
    ), est2 AS (
        SELECT e.q_permille, e.n_rows, e.target_rank,
               round(e.ebin * {_QSK_WIDTH_C}
                     + {_QSK_WIDTH_C} * 1.0
                       * (e.target_rank - (h.cum - h.cnt)) / h.cnt, 4) + 0.0
                   AS est_cents
        FROM est e JOIN hcum h ON h.bin = e.ebin
    ), vcnt AS (
        SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM vals GROUP BY cents
    ), vcum AS (
        SELECT cents,
               CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) AS cum
        FROM vcnt
    ), exact AS (
        SELECT r.q_permille, CAST(min(v.cents) AS BIGINT) AS exact_cents
        FROM ranks r JOIN vcum v ON v.cum >= r.target_rank
        GROUP BY 1
    ), partials AS (
        SELECT mo, least(cents // {_QSK_WIDTH_C}, {_QSK_BINS - 1}) AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM vals GROUP BY 1, 2
    ), merged AS (
        SELECT bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM partials GROUP BY bin
    ), mi AS (
        SELECT ((SELECT count(*) FROM merged m JOIN hist h
                 ON h.bin = m.bin AND h.cnt = m.cnt)
                = (SELECT count(*) FROM hist))
           AND ((SELECT count(*) FROM merged)
                = (SELECT count(*) FROM hist)) AS merge_identity_ok
    )
    SELECT e2.q_permille, e2.n_rows, e2.target_rank,
           x.exact_cents, e2.est_cents,
           round(abs(e2.est_cents - x.exact_cents), 4) + 0.0 AS abs_err_cents,
           mi.merge_identity_ok
    FROM est2 e2 JOIN exact x USING (q_permille) CROSS JOIN mi
    """,
    doc="Mergeable equi-width histogram quantile sketch over order "
    "prices (the fixed-bin estimator production monitors ship when "
    "t-digest/KLL RNG seeds make results engine- and merge-order-"
    "dependent): 64 declared $8k bins in integer cents, nearest-rank "
    "targets p50/p90/p99, within-bin linear interpolation — every "
    "input to the estimate is an exact integer, so the DuckDB twin "
    "reproduces it bit-for-bit, and like the CMS/KMV siblings the "
    "sketch's MERGEABILITY is proved on real data (per-month partial "
    "histograms sum cell-wise to the global histogram). The exact "
    "nearest-rank quantile rides along as the error reference, "
    "computed WITHOUT a global sort: per-$10k-bucket cumulative "
    "windows + broadcast bucket offsets (the orders_price_ks "
    "two-level prefix-sum recipe). Scale shape: two grouped counts "
    "(64-cell histogram; value-grain table for the reference), all "
    "quantile math on bounded frames; at 100 TB you drop the exact "
    "reference column and keep the O(bins) sketch.",
)
def orders_price_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.cache import track_cache

    orders = load_table(spark, sf_dir, "orders")
    vals = orders.filter(F.col("o_totalprice").isNotNull()).select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mo"),
    ).persist()
    n = vals.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    targets = spark.createDataFrame(
        [(int(p),) for p in _QSK_PERMILLE], "q_permille bigint"
    )
    ranks = targets.crossJoin(F.broadcast(n)).select(
        "q_permille",
        "n_rows",
        ((F.col("n_rows") * F.col("q_permille") + 999) / 1000)
        .cast("bigint")
        .alias("target_rank"),
    )
    bin_of = F.least(
        F.floor(F.col("cents") / _QSK_WIDTH_C), F.lit(_QSK_BINS - 1)
    ).cast("bigint")
    hist = vals.groupBy(bin_of.alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wh = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    hcum = hist.select(
        "bin", "cnt", F.sum("cnt").over(wh).cast("bigint").alias("cum")
    ).persist()
    est = (
        F.broadcast(ranks)
        .join(hcum, F.col("cum") >= F.col("target_rank"))
        .groupBy("q_permille", "n_rows", "target_rank")
        .agg(F.min("bin").alias("ebin"))
    )
    est2 = est.join(hcum, est["ebin"] == hcum["bin"]).select(
        "q_permille",
        "n_rows",
        "target_rank",
        F.round(
            F.col("ebin") * _QSK_WIDTH_C
            + _QSK_WIDTH_C
            * F.lit(1.0)
            * (F.col("target_rank") - (F.col("cum") - F.col("cnt")))
            / F.col("cnt"),
            4,
        ).alias("est_cents"),
    )
    # exact nearest-rank reference via the two-level prefix sum (no
    # global single-partition window over the value grain)
    vcnt = vals.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    vcnt = vcnt.withColumn(
        "bkt", F.floor(F.col("cents") / _QSK_PREFIX_BKT_C).cast("bigint")
    )
    wv = (
        Window.partitionBy("bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = vcnt.select(
        "cents", "bkt", F.sum("cnt").over(wv).cast("bigint").alias("within")
    )
    btot = vcnt.groupBy("bkt").agg(F.sum("cnt").cast("bigint").alias("btot"))
    wo = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "bkt",
        F.coalesce(F.sum("btot").over(wo), F.lit(0))
        .cast("bigint")
        .alias("off"),
    )
    vcum = within.join(F.broadcast(offs), "bkt").select(
        "cents", (F.col("off") + F.col("within")).alias("cum")
    )
    exact = (
        F.broadcast(ranks.select("q_permille", "target_rank"))
        .join(vcum, F.col("cum") >= F.col("target_rank"))
        .groupBy("q_permille")
        .agg(F.min("cents").cast("bigint").alias("exact_cents"))
    )
    partials = vals.groupBy("mo", bin_of.alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    merged = partials.groupBy("bin").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    n_match = merged.join(hist, ["bin", "cnt"]).agg(
        F.count(F.lit(1)).alias("n_match")
    )
    n_cells = hist.agg(F.count(F.lit(1)).alias("n_cells"))
    n_merged = merged.agg(F.count(F.lit(1)).alias("n_merged"))
    mi = (
        n_match.crossJoin(F.broadcast(n_cells))
        .crossJoin(F.broadcast(n_merged))
        .select(
            (
                (F.col("n_match") == F.col("n_cells"))
                & (F.col("n_merged") == F.col("n_cells"))
            ).alias("merge_identity_ok")
        )
    )
    out = (
        est2.join(exact, "q_permille")
        .crossJoin(F.broadcast(mi))
        .select(
            "q_permille",
            "n_rows",
            "target_rank",
            "exact_cents",
            "est_cents",
            F.round(F.abs(F.col("est_cents") - F.col("exact_cents")), 4).alias(
                "abs_err_cents"
            ),
            "merge_identity_ok",
        )
    )
    return track_cache(out, vals, hcum)


_KMVS_K = 128
_KMVS_SALT = "kmvs0"
_KMVS_A = "click"
_KMVS_B = "purchase"


def _kmv_setops_sql() -> str:
    u = sql_md5_uniform("key", _KMVS_SALT)
    k = _KMVS_K
    return f"""
    WITH ab AS (
        SELECT CAST(user_id AS VARCHAR) || '@'
                   || CAST(CAST(ts AS DATE) AS VARCHAR) AS key,
               max(CASE WHEN event_type = '{_KMVS_A}' THEN 1 ELSE 0 END)
                   AS in_a,
               max(CASE WHEN event_type = '{_KMVS_B}' THEN 1 ELSE 0 END)
                   AS in_b
        FROM events WHERE event_type IN ('{_KMVS_A}', '{_KMVS_B}')
        GROUP BY 1
    ), hashed AS (
        SELECT key, in_a, in_b, {u} AS u FROM ab
    ), ex AS (
        SELECT CAST(sum(in_a) AS BIGINT) AS exact_a,
               CAST(sum(in_b) AS BIGINT) AS exact_b,
               CAST(count(*) AS BIGINT) AS exact_union,
               CAST(sum(in_a * in_b) AS BIGINT) AS exact_intersection
        FROM hashed
    ), us AS (
        SELECT CAST(count(*) AS BIGINT) AS k_eff, max(u) AS kth,
               CAST(sum(in_a * in_b) AS BIGINT) AS rho_both
        FROM hashed
        WHERE u <= (SELECT max(u)
                    FROM (SELECT u FROM hashed ORDER BY u ASC LIMIT {k}))
    ), sa AS (
        SELECT CAST(count(*) AS BIGINT) AS ka, max(u) AS kth_a
        FROM hashed
        WHERE in_a = 1
          AND u <= (SELECT max(u) FROM (SELECT u FROM hashed
                    WHERE in_a = 1 ORDER BY u ASC LIMIT {k}))
    ), sb AS (
        SELECT CAST(count(*) AS BIGINT) AS kb, max(u) AS kth_b
        FROM hashed
        WHERE in_b = 1
          AND u <= (SELECT max(u) FROM (SELECT u FROM hashed
                    WHERE in_b = 1 ORDER BY u ASC LIMIT {k}))
    )
    SELECT CAST({k} AS BIGINT) AS k,
           round(CASE WHEN sa.ka < {k} THEN CAST(ex.exact_a AS DOUBLE)
                ELSE (sa.ka - 1) / sa.kth_a END, 4) + 0.0 AS est_a,
           round(CASE WHEN sb.kb < {k} THEN CAST(ex.exact_b AS DOUBLE)
                ELSE (sb.kb - 1) / sb.kth_b END, 4) + 0.0 AS est_b,
           round(CASE WHEN us.k_eff < {k} THEN CAST(ex.exact_union AS DOUBLE)
                ELSE (us.k_eff - 1) / us.kth END, 4) + 0.0 AS est_union,
           us.rho_both,
           round(CAST(us.rho_both AS DOUBLE) / us.k_eff, 8) AS jaccard_est,
           round((CAST(us.rho_both AS DOUBLE) / us.k_eff)
                 * (CASE WHEN us.k_eff < {k}
                         THEN CAST(ex.exact_union AS DOUBLE)
                         ELSE (us.k_eff - 1) / us.kth END), 4) + 0.0
               AS est_intersection,
           ex.exact_a, ex.exact_b, ex.exact_union, ex.exact_intersection,
           round(CAST(ex.exact_intersection AS DOUBLE) / ex.exact_union, 8)
               AS jaccard_exact
    FROM us CROSS JOIN sa CROSS JOIN sb CROSS JOIN ex
    """


@register(
    "events_kmv_setops",
    sql=_kmv_setops_sql(),
    doc=f"Theta-sketch SET OPERATIONS over KMV sketches (Dasgupta et "
    f"al., 'Theta-Sketch Framework'): active user-DAY sets of "
    f"'{_KMVS_A}' vs '{_KMVS_B}' events, k={_KMVS_K} — union "
    "cardinality from the union sketch's kth minimum, intersection "
    "via the rho = |union-sketch members in both sets| / k_eff "
    "Jaccard estimator (inclusion-exclusion-free, the way Theta "
    "sketches compose in DataSketches). Extends events_user_kmv_"
    "distinct (single-set cardinality + merge identity) to the "
    "binary-set algebra a 100 TB audience-overlap / dedup-impact "
    "analysis runs on sketches instead of raw keys. Exact "
    "counterparts computed side-by-side so the estimator error is "
    "visible in the row. Float policy: the sketch is a deterministic "
    "function of the key set via the portable md5 uniform (DuckDB "
    "replays it bit-exactly); memberships and counts are exact "
    "integers; the estimate divisions run per-row on engine-identical "
    "values. Scale shape: one grouped flag-agg at (user, day) grain, "
    "one TakeOrdered(k) per sketch (no global sort), membership "
    "filters against broadcast 1-row thresholds.",
)
def events_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import track_cache
    from ..operators.sampling import md5_uniform

    k = _KMVS_K
    events = load_table(spark, sf_dir, "events")
    ab = (
        events.filter(F.col("event_type").isin(_KMVS_A, _KMVS_B))
        .select(
            F.concat_ws(
                "@",
                F.col("user_id").cast("string"),
                F.col("ts").cast("date").cast("string"),
            ).alias("key"),
            F.when(F.col("event_type") == _KMVS_A, 1).otherwise(0).alias("ia"),
            F.when(F.col("event_type") == _KMVS_B, 1).otherwise(0).alias("ib"),
        )
        .groupBy("key")
        .agg(F.max("ia").alias("in_a"), F.max("ib").alias("in_b"))
    )
    hashed = ab.select(
        "key", "in_a", "in_b", md5_uniform(F.col("key"), _KMVS_SALT).alias("u")
    ).persist()
    ex = hashed.agg(
        F.sum("in_a").cast("bigint").alias("exact_a"),
        F.sum("in_b").cast("bigint").alias("exact_b"),
        F.count(F.lit(1)).cast("bigint").alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias(
            "exact_intersection"
        ),
    )

    def kth_cut(df):
        return df.orderBy(F.asc("u")).limit(k).agg(F.max("u").alias("cut"))

    us = (
        hashed.crossJoin(F.broadcast(kth_cut(hashed)))
        .filter(F.col("u") <= F.col("cut"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_eff"),
            F.max("u").alias("kth"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias(
                "rho_both"
            ),
        )
    )
    a_only = hashed.filter(F.col("in_a") == 1)
    b_only = hashed.filter(F.col("in_b") == 1)
    sa = (
        a_only.crossJoin(F.broadcast(kth_cut(a_only)))
        .filter(F.col("u") <= F.col("cut"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ka"), F.max("u").alias("kth_a"))
    )
    sb = (
        b_only.crossJoin(F.broadcast(kth_cut(b_only)))
        .filter(F.col("u") <= F.col("cut"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("kb"), F.max("u").alias("kth_b"))
    )
    est_union = F.when(
        F.col("k_eff") < k, F.col("exact_union").cast("double")
    ).otherwise((F.col("k_eff") - 1) / F.col("kth"))
    out = (
        us.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(ex))
        .select(
            F.lit(k).cast("bigint").alias("k"),
            F.round(
                F.when(F.col("ka") < k, F.col("exact_a").cast("double"))
                .otherwise((F.col("ka") - 1) / F.col("kth_a")),
                4,
            ).alias("est_a"),
            F.round(
                F.when(F.col("kb") < k, F.col("exact_b").cast("double"))
                .otherwise((F.col("kb") - 1) / F.col("kth_b")),
                4,
            ).alias("est_b"),
            F.round(est_union, 4).alias("est_union"),
            "rho_both",
            F.round(
                F.col("rho_both").cast("double") / F.col("k_eff"), 8
            ).alias("jaccard_est"),
            F.round(
                (F.col("rho_both").cast("double") / F.col("k_eff")) * est_union,
                4,
            ).alias("est_intersection"),
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_intersection",
            F.round(
                F.col("exact_intersection").cast("double")
                / F.col("exact_union"),
                8,
            ).alias("jaccard_exact"),
        )
    )
    return track_cache(out, hashed)


@register(
    "multimodal_image_ahash_dedup",
    sql=None,  # Arrow mapInPandas decode path; not SQL-expressible
    doc="Perceptual image dedup via average-hash (Krawetz aHash — the "
    "image-side member of the dedup family: exact dedup keys on "
    "content bytes, THIS keys on decoded visual content, catching "
    "re-encoded/brightness-shifted duplicates byte hashing misses): "
    "decode PNG -> 8x8 nearest-neighbor luminance grid -> 64-bit "
    "threshold-vs-mean hash (integer arithmetic end to end, "
    "brightness-invariant by construction) -> one grouped agg per "
    "hash. Output grain: one row per distinct ahash with group size "
    "and doc-id span — group_size >= 2 IS the perceptual-dup report. "
    "Scale shape: the type filter runs JVM-side BELOW the Arrow "
    "boundary (only image payloads cross into Python), the hash is "
    "8 bytes/image regardless of resolution, and the dedup agg is a "
    "map-side-combining groupBy on that 8-byte key — the same "
    "all-pairs-free shape as the text MinHash path. Rows-only driver "
    "check; hash determinism, brightness invariance, and planted-"
    "duplicate grouping pinned in tests/test_multimodal.py.",
)
def multimodal_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_fake_media, image_ahash

    docs = load_table(spark, sf_dir, "documents")
    hashes = image_ahash(attach_fake_media(docs.select("doc_id")))
    return hashes.groupBy("ahash").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.min("width").alias("min_width"),
        F.max("width").alias("max_width"),
    )
