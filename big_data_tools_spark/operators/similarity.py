"""Similarity search over embedding columns (SURVEY.md §2.11).

Two paths:
- brute-force cosine top-k: broadcast the (small) query set against the
  corpus, score with pure array expressions (zip_with/aggregate —
  JVM-side, no UDF), rank with a window. Exact; cost O(|corpus|·|queries|),
  the right baseline and the correctness oracle for ANN variants.
- LSH-bucketed ANN: ``BucketedRandomProjectionLSH`` (random hyperplane
  buckets); at 100 TB candidates come from bucket joins instead of the
  full cross product.

Embeddings are cast float->double before arithmetic so accumulation is
deterministic and matches DuckDB's double math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .partitioning import fan_out
from .windows import top_k_per_group


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 4,
    max_queries: int | None = 10_000,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rn).

    ``queries`` is broadcast (keep it small — the design point is
    "many corpus rows, few queries"); self-matches are excluded;
    ranking tiebreaks on neighbor id for determinism.

    SCALE GUARD: cost is O(|corpus| x |queries| x dim) — linear in the
    corpus (fine at 100 TB) but quadratic when the query set IS the
    corpus. Above ``max_queries`` queries it raises and points at the
    bucketed tiers (:func:`lsh_ann_topk`, :func:`ivf_topk`), whose
    join cost tracks bucket collisions instead. ``max_queries=None``
    opts out explicitly.
    """
    if max_queries is not None:
        nq = queries.limit(max_queries + 1).count()
        if nq > max_queries:
            raise ValueError(
                f"brute_force_topk broadcasts and scores every query against every "
                f"corpus row; query set has > {max_queries} rows ({nq}+). Use "
                "lsh_ann_topk / ivf_topk for large query sets, or pass "
                "max_queries=None to force the exact plan."
            )
    # norms AND the float->double casts are hoisted to per-ROW
    # projections on each cross-join input: cosine(q, c) inside the
    # join would recompute both L2 norms (plus two array casts) per
    # candidate pair — 3x the element work and 4 extra array
    # allocations per pair vs the dot product alone (the r11
    # IvfIndex.search measurement: the scoring stage was the entire
    # wall). Same expression tree (dot / (qn * cn)) on identical
    # doubles, so results are bit-identical.
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("q_vec"),
        ).withColumn("__qn", l2_norm(F.col("q_vec")))
    )
    # vector math is the heavy step — spread single-file corpora over
    # all cores before the broadcast cross join
    c = fan_out(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
    ).withColumn("__cn", l2_norm(F.col("c_vec")))
    sim = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("__qn") * F.col("__cn"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    return top_k_per_group(
        scored,
        keys=["query_id"],
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
    )


class IvfIndex:
    """Fit-once / search-many IVF index (inverted-file ANN as in
    IVF-Flat, e.g. Johnson/Douze/Jegou, "Billion-scale similarity
    search with GPUs", 2017).

    The expensive parts — the seeded KMeans fit and the corpus
    assignment scan — run once in :meth:`fit` (assignment persisted);
    each :meth:`search` is then just (queries x n_probe) ⋈ cluster +
    exact cosine inside probed lists, cost ~ n_probe/n_clusters of
    brute force. Centroids (n_clusters x dim) broadcast.
    Deterministic: seeded fit, ranked with id tiebreaks.
    """

    def __init__(self, assigned: DataFrame, cents: DataFrame, id_col: str, vec_col: str):
        self._assigned = assigned
        self._cents = cents
        self._id_col = id_col
        self._vec_col = vec_col

    @classmethod
    def fit(
        cls,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_clusters: int | str = 16,
        max_iter: int = 20,
        init_mode: str = "k-means||",
        fit_sample_cap: int | None = None,
        auto_rows_per_cluster: int = 2048,
        fit_rows_per_centroid: int | None = None,
    ) -> "IvfIndex":
        """``max_iter``/``init_mode`` trade centroid quality for fit
        cost. ANN search wants the defaults; bucketing uses (SemDeDup)
        care only that near-identical vectors co-cluster, which random
        init + a few Lloyd iterations already guarantees — and each
        saved iteration is a full corpus pass.

        ``fit_sample_cap`` bounds the rows the Lloyd iterations ever
        see: the model fits on a deterministic md5-uniform sample of at
        most that many vectors, then the FULL corpus is assigned in one
        transform pass. At 100 TB this is the only viable shape — MLlib
        internally caches the fit input for its iterations, and caching
        the whole corpus to run 8+ passes over it is infeasible, while
        centroids estimated from a ~10^5-vector sample route/bucket just
        as well (IVF training and SemDeDup both standardly fit on a
        subset). ``None`` keeps the exact full-corpus fit; when the
        corpus is already under the cap the sample is the identity, so
        behavior at test scale is unchanged.

        ``n_clusters="auto"`` sizes k WITH the corpus —
        ``k = clamp(ceil(n / auto_rows_per_cluster), 4, 65536)`` — the
        SemDeDup paper's own protocol (k=11k for 5B docs, i.e. fixed
        expected cluster size). This is the scale-critical choice for
        bucketing: with k ∝ n the in-cluster pair scan costs
        ~ n × auto_rows_per_cluster (LINEAR in corpus size) instead of
        the n²/k quadratic a fixed k degrades to; the fit cost rises
        with k, which is exactly what ``fit_sample_cap`` bounds.

        ``fit_rows_per_centroid`` (bucketing callers) tightens the
        Lloyd sample to ``min(fit_sample_cap, that × k)`` — estimating
        k centroids needs O(rows-per-centroid) samples, not the whole
        corpus, so the fit stays O(k) while the assignment pass stays
        the one full-corpus scan."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        from .sampling import md5_uniform

        c = fan_out(corpus, id_col).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            array_to_vector(_as_double(F.col(vec_col))).alias("features"),
        )
        n = None
        if n_clusters == "auto":
            n = c.count()
            n_clusters = max(4, min(65536, -(-n // auto_rows_per_cluster)))
        if fit_rows_per_centroid is not None:
            per_k = fit_rows_per_centroid * n_clusters
            fit_sample_cap = per_k if fit_sample_cap is None else min(
                fit_sample_cap, per_k
            )
        train = c
        if fit_sample_cap is not None:
            if n is None:
                n = c.count()
            if n > fit_sample_cap:
                # deterministic membership (portable md5 uniform on the
                # id), not .sample(): stable across partitioning, so the
                # fit — and every downstream assignment — is reproducible
                frac = fit_sample_cap / n
                train = c.filter(
                    md5_uniform(F.col("neighbor_id"), salt="ivf-fit") < F.lit(frac)
                ).persist()
        model = KMeans(
            k=n_clusters, seed=7, featuresCol="features",
            maxIter=max_iter, initMode=init_mode,
        ).fit(train)
        if train is not c:
            train.unpersist()
        assigned = model.transform(c).select(
            "neighbor_id", "c_vec", F.col("prediction").alias("cluster_id")
        ).persist()
        # centroid table is tiny (n_clusters rows) -> broadcast routing
        cents = F.broadcast(
            c.sparkSession.createDataFrame(
                [
                    (i, [float(x) for x in ctr])
                    for i, ctr in enumerate(model.clusterCenters())
                ],
                "cluster_id int, centroid array<double>",
            )
        )
        return cls(assigned, cents, id_col, vec_col)

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 4,
        round_digits: int | None = 4,
        broadcast_max_queries: int | None = 4096,
        n_shards: int = 8,
    ) -> DataFrame:
        """Probe the ``n_probe`` nearest inverted lists per query and
        rank exact cosine inside them.

        The scoring join's key is the cluster id — k distinct keys
        carrying wide array payloads, the few-keys/fat-rows shape that
        skews when one centroid swallows a hub cluster (r10 verdict
        next #1). Two scale-safe plans, chosen by query-batch size:

        - batch <= ``broadcast_max_queries``: BROADCAST the routed
          query side (|queries| x n_probe rows) against the inverted
          lists — the corpus assignment never shuffles at all, every
          executor streams its resident partition. This is the
          fit-once/search-many design point (few queries, huge
          corpus), so it is the common case.
        - larger batches (every-vector-as-query audits): SALT the join
          by a within-cluster shard — ``pmod(xxhash64(neighbor_id),
          n_shards)`` on the list side, an n_shards-way explode on the
          routed side — so a hub cluster spreads over ``n_shards``
          reducers instead of one. Query-side shuffle volume grows
          x n_shards; list-side volume is unchanged; reducer
          parallelism becomes k x n_shards.

        ``broadcast_max_queries=None`` (or 0) forces the salted plan;
        ``n_shards=1`` degenerates to the plain equi-join.
        """
        q = queries.select(
            F.col(self._id_col).alias("query_id"), F.col(self._vec_col).alias("q_vec")
        )
        # norms are hoisted to per-ROW projections on each join input:
        # cosine(q, c) inside the join would recompute BOTH L2 norms
        # per candidate pair — 3x the element work of the dot product
        # alone (measured r11: the scoring stage is the entire sf1
        # wall). Same expression tree (dot / (qn * cn)), so results
        # are bit-identical.
        routed = top_k_per_group(
            q.crossJoin(self._cents).select(
                "query_id",
                "q_vec",
                "cluster_id",
                cosine(F.col("q_vec"), F.col("centroid")).alias("c_sim"),
            ),
            keys=["query_id"],
            order_by=[F.col("c_sim").desc(), F.col("cluster_id").asc()],
            k=n_probe,
        ).select(
            "query_id",
            "q_vec",
            "cluster_id",
            l2_norm(F.col("q_vec")).alias("__qn"),
        )
        lists = self._assigned.withColumn("__cn", l2_norm(F.col("c_vec")))

        small_batch = False
        if broadcast_max_queries:
            nq = queries.limit(broadcast_max_queries + 1).count()
            small_batch = nq <= broadcast_max_queries

        sim = dot(F.col("q_vec"), F.col("c_vec")) / (
            F.col("__qn") * F.col("__cn")
        )
        if round_digits is not None:
            sim = F.round(sim, round_digits)
        if small_batch:
            joined = lists.join(F.broadcast(routed), "cluster_id")
        else:
            shard = F.pmod(F.xxhash64("neighbor_id"), F.lit(n_shards)).cast(
                "int"
            )
            sharded = lists.withColumn("__shard", shard)
            fanned = routed.withColumn(
                "__shard",
                F.explode(F.array(*[F.lit(i) for i in range(n_shards)])),
            )
            joined = fanned.join(
                sharded.hint("shuffle_hash"), ["cluster_id", "__shard"]
            )
        scored = joined.filter(
            F.col("query_id") != F.col("neighbor_id")
        ).select("query_id", "neighbor_id", sim.alias("cos_sim"))
        return top_k_per_group(
            scored,
            keys=["query_id"],
            order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
            k=k,
        )

    def unpersist(self) -> None:
        self._assigned.unpersist()

    def save(self, path: str) -> None:
        """Persist the fitted index to ``path`` (two parquet datasets +
        a JSON sidecar), making fit-once/search-many hold ACROSS
        sessions — the index a nightly embedding pipeline builds once
        and every retrieval job loads. Assignment writes partitioned
        by cluster so a later :meth:`search` prunes the probed lists
        at the file level (partition pruning on cluster id)."""
        import json
        import os

        self._assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(
            os.path.join(path, "assigned")
        )
        self._cents.write.mode("overwrite").parquet(os.path.join(path, "cents"))
        meta = {"id_col": self._id_col, "vec_col": self._vec_col, "format": 1}
        spark = self._assigned.sparkSession
        spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
            1
        ).write.mode("overwrite").json(os.path.join(path, "meta"))

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        """Reload an index written by :meth:`save`; the assignment is
        re-persisted so repeated searches stay memory-resident."""
        import json
        import os

        meta_rows = spark.read.json(os.path.join(path, "meta")).collect()
        meta = json.loads(meta_rows[0]["meta"])
        if meta.get("format") != 1:
            raise ValueError(f"unknown IvfIndex format: {meta.get('format')}")
        assigned = spark.read.parquet(os.path.join(path, "assigned")).persist()
        cents = spark.read.parquet(os.path.join(path, "cents"))
        return cls(assigned, cents, meta["id_col"], meta["vec_col"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    round_digits: int | None = 4,
) -> DataFrame:
    """One-shot convenience over :class:`IvfIndex` (fit + search).
    For repeated query batches, hold the index and call
    :meth:`IvfIndex.search` — the fit and assignment scan amortize."""
    return IvfIndex.fit(corpus, id_col, vec_col, n_clusters).search(
        queries, k=k, n_probe=n_probe, round_digits=round_digits
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    max_distance: float = 10.0,
) -> DataFrame:
    """Approximate top-k via random-hyperplane bucketing
    (BucketedRandomProjectionLSH on L2 distance). Returns
    (query_id, neighbor_id, l2_dist, rn<=k). The scale path: join cost
    follows bucket collisions, not |corpus| x |queries|.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = fan_out(corpus, id_col).select(
        F.col(id_col).alias("nid"), array_to_vector(_as_double(F.col(vec_col))).alias("features")
    )
    q = queries.select(
        F.col(id_col).alias("qid"), array_to_vector(_as_double(F.col(vec_col))).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=7,
    )
    model = lsh.fit(c)
    pairs = model.approxSimilarityJoin(q, c, max_distance, distCol="l2_dist")
    scored = pairs.select(
        F.col("datasetA.qid").alias("query_id"),
        F.col("datasetB.nid").alias("neighbor_id"),
        F.round(F.col("l2_dist"), 4).alias("l2_dist"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    return top_k_per_group(
        scored,
        keys=["query_id"],
        order_by=[F.col("l2_dist").asc(), F.col("neighbor_id").asc()],
        k=k,
    )


# ---------------------------------------------------------- int8 quantization

def with_int8_quantization(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric max-abs int8 scalar quantization: per vector,
    ``scale = max(|v|)/127`` and ``q_i = round(v_i/scale)`` (so
    ``q_i in [-127, 127]`` with no clamping needed). Zero vectors
    quantize to all-zero with scale 0.

    4x smaller vectors (and 4x less shuffle/scan traffic at 100 TB);
    cosine over the int8 vectors needs no dequantization because the
    scale cancels — see :func:`int_dot` / :func:`quantized_topk`.
    Materializes the max-abs as a real column (separate projection)
    so it isn't recomputed inside the per-element lambda.
    """
    mx_c = f"__q8_mx_{q_col}"
    step1 = df.withColumn(
        mx_c, F.array_max(F.transform(_as_double(F.col(vec_col)), F.abs))
    )
    scale = F.col(mx_c) / 127.0
    q = F.when(
        F.col(mx_c) > 0,
        F.transform(
            _as_double(F.col(vec_col)), lambda x: F.round(x / scale).cast("int")
        ),
    ).otherwise(F.transform(_as_double(F.col(vec_col)), lambda _: F.lit(0)))
    return (
        step1.withColumn(scale_col, scale).withColumn(q_col, q).drop(mx_c)
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int8-quantized vectors
    (bigint — products are <= 127^2, so any realistic dim fits)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 4,
    max_queries: int | None = 10_000,
) -> DataFrame:
    """Brute-force top-k over int8-quantized vectors: exact INTEGER
    dot products (engine-deterministic with no float-sum policy), norms
    precomputed per side so the cross join multiplies and divides
    scalars only. Same shape/guard as :func:`brute_force_topk`; the
    scale factors cancel in the cosine so they are never read.

    Accuracy loss vs exact cosine is bounded by quantization error
    (recall vs :func:`brute_force_topk` asserted in tests); the win is
    4x less broadcast/scan volume — at 100 TB the difference between
    shipping 400 GB and 100 GB of vectors through the scan.
    """
    if max_queries is not None:
        nq = queries.limit(max_queries + 1).count()
        if nq > max_queries:
            raise ValueError(
                f"quantized_topk broadcasts and scores every query against every "
                f"corpus row; query set has > {max_queries} rows ({nq}+). Use "
                "lsh_ann_topk / ivf_topk for large query sets, or pass "
                "max_queries=None to force the exact plan."
            )
    def prep(df: DataFrame, id_out: str, q_out: str, norm_out: str) -> DataFrame:
        qd = with_int8_quantization(df, vec_col, "q", "s")
        return qd.withColumn(
            norm_out, F.sqrt(int_dot(F.col("q"), F.col("q")).cast("double"))
        ).select(
            F.col(id_col).alias(id_out), F.col("q").alias(q_out), norm_out
        )

    q = F.broadcast(prep(queries, "query_id", "q_q", "q_norm"))
    c = prep(fan_out(corpus, id_col), "neighbor_id", "c_q", "c_norm")
    sim = int_dot(F.col("q_q"), F.col("c_q")).cast("double") / (
        F.col("q_norm") * F.col("c_norm")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    return top_k_per_group(
        scored,
        keys=["query_id"],
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
    )
