"""Product quantization ANN (the PQ of IVF-PQ; Jegou/Douze/Schmid,
"Product quantization for nearest neighbor search", TPAMI 2011).

Completes the similarity tier ladder (brute -> int8 -> LSH -> IVF):
PQ compresses each vector to ``m`` one-byte-ish codes — at 100 TB the
difference between an index that fits in aggregate executor memory
and one that doesn't (64-dim float = 256 B/vec; m=8 PQ = 8 B/vec).

Scale shape:

- **fit** splits each (L2-normalized) vector into ``m`` subvectors
  and runs one seeded KMeans per subspace — ``m`` corpus passes at
  fit time, the standard trade (production trains codebooks on a
  sample; pass ``fit_fraction`` to do the same via deterministic hash
  sampling). Encoding is ``m`` chained model.transform projections;
  the (id, codes) table is persisted — it IS the index.
- **search** is asymmetric distance computation (ADC): the query is
  NOT quantized; a per-query lookup table ``lut[j][c] =
  dot(q_j, centroid_{j,c})`` (m x k floats, built driver-side from
  the tiny codebooks) is embedded as a literal and broadcast with the
  query set, and each corpus row's score is ``m`` array lookups —
  pure Catalyst expressions, no float dot products, no shuffle of the
  corpus. Query sets are bounded by the same ``max_queries`` guard as
  the brute-force baseline.

Vectors are L2-normalized on BOTH sides so ADC's inner product
approximates cosine directly. Seeded fits + id tiebreaks make results
deterministic; rows-only for the driver (KMeans is Spark-seeded),
recall vs brute force pinned in tests/test_pq.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .partitioning import fan_out
from .similarity import _as_double, l2_norm
from .windows import top_k_per_group


def _l2_normalize(vec: Column) -> Column:
    """vec / ||vec|| as array<double> (a zero norm yields nulls, which
    drop out of ADC sums)."""
    v = _as_double(vec)
    n = l2_norm(vec)
    return F.transform(v, lambda x: x / n)


class PqIndex:
    """Fit-once / search-many product-quantization index."""

    def __init__(self, codes: DataFrame, codebooks: list[list[list[float]]], m: int, sub: int):
        self._codes = codes  # (neighbor_id, codes: array<int>)
        self._codebooks = codebooks  # [subspace][code][component]
        self._m = m
        self._sub = sub

    @classmethod
    def fit(
        cls,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        m: int = 8,
        k_codes: int = 16,
        max_iter: int = 20,
        fit_fraction: float = 1.0,
        seed: int = 7,
    ) -> "PqIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
        if dim_row is None:
            raise ValueError("PqIndex.fit: empty corpus")
        dim = dim_row["d"]
        if dim % m != 0:
            raise ValueError(f"PqIndex.fit: dim {dim} not divisible by m={m}")
        sub = dim // m

        base = fan_out(corpus, id_col).select(
            F.col(id_col).alias("neighbor_id"),
            _l2_normalize(F.col(vec_col)).alias("nv"),
        )
        for j in range(m):
            base = base.withColumn(
                f"__sv{j}", array_to_vector(F.slice(F.col("nv"), j * sub + 1, sub))
            )

        fit_on = base
        if fit_fraction < 1.0:
            from .sampling import hash_sample

            fit_on = hash_sample(base, "neighbor_id", fit_fraction, salt="pq")

        codebooks: list[list[list[float]]] = []
        encoded = base
        for j in range(m):
            model = KMeans(
                k=k_codes, seed=seed + j, featuresCol=f"__sv{j}",
                predictionCol=f"__c{j}", maxIter=max_iter,
            ).fit(fit_on)
            codebooks.append([[float(x) for x in c] for c in model.clusterCenters()])
            encoded = model.transform(encoded)

        codes = encoded.select(
            "neighbor_id",
            F.array(*[F.col(f"__c{j}") for j in range(m)]).alias("codes"),
        ).persist()
        codes.count()
        return cls(codes, codebooks, m, sub)

    def search(
        self,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
        round_digits: int | None = 4,
        max_queries: int = 1000,
        refine: int | None = None,
        corpus: DataFrame | None = None,
    ) -> DataFrame:
        """ADC top-k: per-query LUTs (m x k_codes doubles each) are
        built driver-side from the codebooks and shipped as a literal
        broadcast frame; corpus cost is m array lookups per (query,
        row).

        ``refine=N`` adds the standard re-rank stage (FAISS
        ``IndexRefineFlat``): the ADC pass shortlists N candidates per
        query, then ONLY those rows' true vectors are read from
        ``corpus`` (broadcast-shortlist semi-scan — the corpus never
        shuffles) and re-scored with exact cosine. Quantization error
        then only has to keep the true top-k inside the top-N, a far
        weaker ask: measured on the driver testdata, m=16 ADC alone
        recalls ~0.3-0.5 of the exact top-5 while refine=50 recalls
        0.9-1.0."""
        rows = queries.select(
            F.col(id_col).alias("query_id"),
            _l2_normalize(F.col(vec_col)).alias("qv"),
        ).collect()
        if len(rows) > max_queries:
            raise ValueError(
                f"PqIndex.search: query set has {len(rows)} rows > "
                f"max_queries={max_queries}; ADC broadcasts one LUT per "
                "query — batch the query set or raise the bound explicitly."
            )

        luts = []
        for r in rows:
            qv = r["qv"]
            lut = [
                [
                    sum(
                        qv[j * self._sub + t] * cent[t]
                        for t in range(self._sub)
                    )
                    for cent in self._codebooks[j]
                ]
                for j in range(self._m)
            ]
            luts.append((r["query_id"], lut))

        spark = self._codes.sparkSession
        qdf = F.broadcast(
            spark.createDataFrame(
                luts, f"query_id long, lut array<array<double>>"
            )
        )
        score = F.aggregate(
            F.sequence(F.lit(0), F.lit(self._m - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(
                F.element_at(F.col("lut"), j + F.lit(1)),
                F.element_at(F.col("codes"), j + F.lit(1)) + F.lit(1),
            ),
        )
        if round_digits is not None:
            score = F.round(score, round_digits)
        scored = (
            self._codes.crossJoin(qdf)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", score.alias("adc_sim"))
        )
        shortlist = top_k_per_group(
            scored,
            keys=["query_id"],
            order_by=[F.col("adc_sim").desc(), F.col("neighbor_id").asc()],
            k=refine if refine is not None else k,
        )
        if refine is None:
            return shortlist
        if corpus is None:
            raise ValueError("PqIndex.search: refine=N requires the corpus frame")

        cor = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _l2_normalize(F.col(vec_col)).alias("nv"),
        )
        qvecs = F.broadcast(
            spark.createDataFrame(
                [(r["query_id"], list(r["qv"])) for r in rows],
                "query_id long, qv array<double>",
            )
        )
        exact = F.aggregate(
            F.zip_with(F.col("qv"), F.col("nv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if round_digits is not None:
            exact = F.round(exact, round_digits)
        reranked = (
            cor.join(F.broadcast(shortlist.select("query_id", "neighbor_id")), "neighbor_id")
            .join(qvecs, "query_id")
            .select("query_id", "neighbor_id", exact.alias("cos_sim"))
        )
        return top_k_per_group(
            reranked,
            keys=["query_id"],
            order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
            k=k,
        )

    def unpersist(self) -> None:
        self._codes.unpersist()


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    k_codes: int = 16,
    refine: int | None = None,
) -> DataFrame:
    """One-shot convenience (fit + search). Hold a :class:`PqIndex`
    and reuse :meth:`PqIndex.search` to amortize the fit."""
    from .cache import track_cache

    idx = PqIndex.fit(corpus, id_col, vec_col, m=m, k_codes=k_codes)
    out = idx.search(
        queries, id_col, vec_col, k=k, refine=refine,
        corpus=corpus if refine is not None else None,
    )
    return track_cache(out, idx._codes)
