"""Deduplication operators for LLM-data pipelines (SURVEY.md §2.11).

Four tiers, in increasing recall / decreasing exactness:
- exact: content-hash groupBy (generalizes reference ``dropDuplicates``
  ``Databricks Notebook.py:160,611`` to normalized-content identity);
- n-gram Jaccard: shingle inverted-index self-join — exact Jaccard on
  candidate pairs that share >= 1 shingle;
- MinHash+LSH: one-permutation MinHash signatures + banded candidate
  join, pure Catalyst expressions (the 100 TB path: cost ~ #near-dup
  candidates, not #pairs^2; ml.MinHashLSH variant kept for parity);
- SimHash: 64-bit sign-of-weighted-sum fingerprint, hamming-banded.

Scale notes baked in: shingle join caps per-shingle document frequency
(hot shingles like boilerplate headers otherwise quadratically explode
the candidate pair set); all outputs keep the canonical doc (min id)
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import fan_out
from .text import fingerprint, shingles


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct normalized content: canonical (min) id,
    group size. Single hash-shuffle on the 128-bit fingerprint."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("group_size"),
        )
    )


def canonical_survivors(
    df: DataFrame, text_col: str, id_col: str, quality_col: str
) -> DataFrame:
    """One row per content group: the representative that survives
    dedup — highest ``quality_col``, lowest ``id_col`` as the
    deterministic tie-break — plus the group size. Singleton groups
    keep their only member, so the output is the deduplicated corpus
    manifest. One fingerprint shuffle; the rank and the group-size
    count share the same partitioned window sort."""
    from pyspark.sql import Window

    fp = df.select(
        F.col(id_col), F.col(quality_col), fingerprint(F.col(text_col)).alias("fingerprint")
    )
    w_rank = Window.partitionBy("fingerprint").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    w_all = Window.partitionBy("fingerprint")
    ranked = fp.select(
        "fingerprint",
        F.col(id_col).alias(f"keep_{id_col}"),
        F.col(quality_col).alias(f"keep_{quality_col}"),
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("group_size"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "fingerprint", "group_size", f"keep_{id_col}", f"keep_{quality_col}"
    )


def shingle_index(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, hashed: bool = False
) -> DataFrame:
    """Exploded distinct (id, shingle) inverted index.

    ``hashed=True`` replaces the shingle string with its xxhash64 —
    8-byte shuffle keys instead of ~10s-of-bytes strings, which at
    corpus scale cuts the self-join shuffle volume several-fold.
    64-bit collisions (~n^2/2^65) are negligible for dedup purposes.
    """
    sh = F.explode(shingles(F.col(text_col), n)).alias("shingle")
    # shingling is the expensive per-row step — spread single-file
    # inputs across all cores before computing it
    out = fan_out(df, id_col).select(F.col(id_col).alias("doc"), sh)
    if hashed:
        out = out.select("doc", F.xxhash64("shingle").alias("shingle"))
    return out


# "auto" df-cap bounds (see jaccard_pairs): the cap never exceeds the
# old static default, never drops below a floor that would hurt small
# corpora, and grows as ceil(sqrt(n_docs)) in between.
JACCARD_AUTO_CAP_MAX = 1000
JACCARD_AUTO_CAP_MIN = 100

# Above this corpus size the posting-list path routes to the PPJoin
# prefix variant (r7, VERDICT r6 #5). Measured motivation: on the
# saturated-vocabulary synthetic corpus the WHOLE shingle-df
# distribution shifts up with n (typical df ~56 at sf1 -> ~168 at
# sf3), so Sigma-df^2 grows ~n^2 and NO head cap can fix it without
# destroying the operator — the sweep measured x12.5 for 3x data even
# with the relative cap engaged. Prefix filtering bounds candidates by
# the rarest-(1-t) prefix tokens instead of every shared shingle, and
# is EXACT (no df cap in that path), so routing changes wall clock,
# not results.
JACCARD_PREFIX_ROUTE_MIN_DOCS = 20_000


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | str | None = "auto",
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing a shingle.

    ``max_doc_freq`` drops shingles present in more than that many docs
    before the self-join — the standard guard against boilerplate
    shingles creating O(df^2) candidate pairs at scale.

    The default is ``"auto"`` (r7, VERDICT r6 #5): cap =
    min(1000, max(100, ceil(sqrt(n_docs)))), computed distributively
    from a 1-row count (no collect). Rationale: the r6 sf1->sf3 sweep
    measured x12.7 growth for 3x data on a saturated-vocabulary corpus
    because a STATIC cap never engages when max(df) ~ O(n) stays under
    it — the cap must scale RELATIVE to the corpus. A sqrt(N) cap
    bounds per-shingle candidate work df^2 <= N, so total candidate
    mass stays ~linear in corpus size even when the shingle space
    saturates, while a shingle shared by > sqrt(N) docs carries ~zero
    Jaccard information to begin with. Small corpora (sqrt(N) < 100)
    keep the permissive floor, so sf0.01 oracle output is unchanged.

    With ``max_doc_freq="auto"`` the operator also ROUTES: above
    ``JACCARD_PREFIX_ROUTE_MIN_DOCS`` documents it delegates to
    :func:`jaccard_prefix_pairs` (exact PPJoin — same contract, no df
    cap needed, and its candidate set is bounded by prefix tokens
    instead of every shared shingle, which is what actually survives a
    saturated shingle space; see JACCARD_PREFIX_ROUTE_MIN_DOCS). The
    routing count is one parquet-metadata-cheap ``df.count()``.

    Returns (id_a < id_b, jaccard) pairs with jaccard >= threshold.
    Persisted intermediates are tagged on the result; callers release
    them after their action via ``operators.cache.release_caches``.
    """
    from .cache import track_cache

    if max_doc_freq == "auto" and df.count() > JACCARD_PREFIX_ROUTE_MIN_DOCS:
        return jaccard_prefix_pairs(
            df, text_col, id_col, n=n, threshold=threshold
        )

    # the (doc, shingle) index feeds three consumers (doc-frequency cap,
    # per-doc sizes, self-join both sides); persist it once instead of
    # re-deriving the shingle expressions per consumer — at scale this
    # is the difference between 1 and 4 corpus scans.
    raw_idx = idx = shingle_index(df, text_col, id_col, n, hashed=True).persist()
    if max_doc_freq is not None:
        freq = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        if max_doc_freq == "auto":
            cap_frame = df.agg(
                F.least(
                    F.lit(JACCARD_AUTO_CAP_MAX),
                    F.greatest(
                        F.lit(JACCARD_AUTO_CAP_MIN),
                        F.ceil(F.sqrt(F.count(F.lit(1)))),
                    ),
                ).alias("cap")
            )
            freq = freq.crossJoin(F.broadcast(cap_frame))
        else:
            freq = freq.withColumn("cap", F.lit(int(max_doc_freq)))
        # shuffle-hash pinned: the shingle-df table is O(distinct
        # shingles) — corpus-sized, never broadcastable at scale (an
        # AQE broadcast promotion of it OOMed the driver on the sf1
        # run), and the join's shingle exchange is reused by the
        # posting-list groupBy below anyway
        idx = (
            idx.join(
                freq.filter(F.col("df") <= F.col("cap"))
                .select("shingle")
                .hint("shuffle_hash"),
                "shingle",
            )
        ).persist()
    sizes = idx.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))

    # candidate pairs from posting lists: group the index by shingle and
    # expand each (bounded, <= max_doc_freq) posting list into its
    # doc-id pairs with one array expression — one shuffle on shingle
    # instead of a full index self-join (two shuffles + join). This is
    # the classic inverted-index candidate generation; the df cap above
    # bounds the quadratic expansion per shingle.
    posting = idx.groupBy("shingle").agg(F.sort_array(F.collect_list("doc")).alias("docs"))
    pair_expr = (
        "flatten(transform(docs, (x, i) -> "
        "transform(slice(docs, i + 2, size(docs)), y -> struct(x AS id_a, y AS id_b))))"
    )
    common = (
        posting.filter(F.size("docs") > 1)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"))
    # build the (small, per-doc) size side with shuffle-hash: left to
    # itself the optimizer broadcast the CANDIDATE-PAIR side off a
    # stale post-aggregation estimate — O(candidate pairs) is the one
    # frame here that must never broadcast (driver OOM at sf1)
    jac = (
        common.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
    )
    out = jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")
    return track_cache(out, raw_idx, idx)


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold_micro: int = 900_000,
    min_shingles: int = 5,
    max_doc_freq: int | str | None = "auto",
) -> DataFrame:
    """Overlap-coefficient (Szymkiewicz–Simpson) containment pairs:
    |sh(A) ∩ sh(B)| / min(|sh(A)|, |sh(B)|) >= threshold — the dedup
    tier Jaccard structurally misses. A short document quoted whole
    inside a much longer one has Jaccard ~ |A|/|B| (arbitrarily low)
    but containment ~ 1; for LLM corpora this is the
    quote/excerpt/boilerplate-inclusion detector (the "document
    embedded in another document" case Lee et al. 2022's substring
    dedup targets, here at shingle granularity over the same inverted
    index the Jaccard tier already builds).

    Float policy: fully integer — the threshold is applied as the
    cross-multiplication ``1e6*common >= threshold_micro*min_sh`` (no
    division in the predicate) and the emitted score is
    ``containment_micro`` via the truncating-division idiom, so no
    double ever exists. ``min_shingles`` drops trivially-small sets
    whose containment is noise.

    100 TB shape: identical skeleton to :func:`jaccard_pairs` — one
    persisted (doc, shingle) index, relative df cap (sqrt(N)) bounding
    the posting-list expansion (candidate mass <= V*N for V distinct
    shingles — linear in corpus size), candidate pairs from grouped
    posting lists (one shuffle on the 8-byte shingle hash),
    shuffle-hash size joins. SCALE GUIDANCE (revised r10): the r10
    sf1 sweep measured this capped path at x30.7/decade on the
    saturated-vocabulary corpus while the EXACT
    :func:`containment_prefix_pairs` read x4.5 on the same data
    (11.4s vs 82.2s at sf1), and the r10 natural-corpus A/B
    (SCALING.md) measured the prefix tier 2.1-2.4x faster there too —
    so at sf0.1-plus corpus sizes prefer the prefix tier in BOTH
    vocabulary regimes; this capped path stays the cheaper choice
    only for small corpora (it was 1.3-1.4x faster below ~sf0.1).
    Not auto-routed: the cap CHANGES results (evidence shingles
    dropped), so the two tiers are separate registered surfaces and
    callers pick semantics explicitly (equality on uncapped corpora
    pinned in tests/test_round9_ops.py).
    """
    from .cache import track_cache

    raw_idx = idx = shingle_index(df, text_col, id_col, n, hashed=True).persist()
    if max_doc_freq is not None:
        freq = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        if max_doc_freq == "auto":
            cap_frame = df.agg(
                F.least(
                    F.lit(JACCARD_AUTO_CAP_MAX),
                    F.greatest(
                        F.lit(JACCARD_AUTO_CAP_MIN),
                        F.ceil(F.sqrt(F.count(F.lit(1)))),
                    ),
                ).alias("cap")
            )
            freq = freq.crossJoin(F.broadcast(cap_frame))
        else:
            freq = freq.withColumn("cap", F.lit(int(max_doc_freq)))
        idx = (
            idx.join(
                freq.filter(F.col("df") <= F.col("cap"))
                .select("shingle")
                .hint("shuffle_hash"),
                "shingle",
            )
        ).persist()
    sizes = idx.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    posting = idx.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc")).alias("docs")
    )
    pair_expr = (
        "flatten(transform(docs, (x, i) -> "
        "transform(slice(docs, i + 2, size(docs)), y -> struct(x AS id_a, y AS id_b))))"
    )
    common = (
        posting.filter(F.size("docs") > 1)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"))
    scored = (
        common.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .withColumn("min_sh", F.least(F.col("n_a"), F.col("n_b")).cast("bigint"))
    )
    mega = F.lit(1_000_000).cast("bigint")
    num = mega * F.col("common")
    out = (
        scored.filter(
            (F.col("min_sh") >= F.lit(int(min_shingles)))
            & (num >= F.lit(int(threshold_micro)) * F.col("min_sh"))
        )
        .select(
            "id_a",
            "id_b",
            "common",
            "min_sh",
            ((num - num % F.col("min_sh")) / F.col("min_sh"))
            .cast("bigint")
            .alias("containment_micro"),
        )
    )
    return track_cache(out, raw_idx, idx)


def containment_prefix_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold_micro: int = 900_000,
    min_shingles: int = 5,
    max_prefix_freq: int | None = None,
) -> DataFrame:
    """EXACT overlap-coefficient containment pairs via min-side prefix
    probing — the RECOMMENDED containment tier at scale (revised r10):
    the sf1 sweep measured it at x4.5/decade vs the capped path's
    x30.7 on the saturated corpus (11.4s vs 82.2s), and the
    natural-corpus A/B at 2.1-2.4x faster with identical exact
    output (SCALING.md r10). The capped :func:`containment_pairs`
    remains cheaper only below ~sf0.1 corpus sizes. Not auto-routed
    because the cap CHANGES results — the tiers are distinct
    semantics, chosen explicitly.

    Overlap prefix lemma (the PPJoin prefix idea adapted to the
    overlap coefficient): O(x,y) = c / min(|x|,|y|) >= t with
    m = min(|x|,|y|) forces c >= ceil(t*m), so the SMALLER side
    misses at most m - ceil(t*m) of its shingles from the partner —
    by pigeonhole, among its first m - ceil(t*m) + 1 shingles (any
    fixed order; rarest-first keeps postings short) at least one is
    shared. Candidates therefore come from joining each doc's PREFIX
    tokens against the FULL index: for a qualifying pair the smaller
    side's prefix always hits the larger side's set, so the
    candidate set is complete and the verify stage
    (``array_intersect`` on per-doc sorted shingle arrays) is exact.
    Unlike Jaccard-PPJoin there is NO length filter — a 10-shingle
    quote inside a 10,000-shingle document is precisely the target —
    which is also why the plain posting-list path cannot be saved by
    a df cap at scale (r9 sf1 sweep: x7.3 for 10x data).

    100 TB shape: (1) one shingle-df join + per-doc rank window
    (bounded by doc length); (2) the prefix-vs-full join shuffles on
    the 8-byte shingle hash, and its candidate mass is
    sum over prefix entries of df(token) — prefix tokens are each
    doc's RAREST ~(1-t) fraction, so hot boilerplate shingles never
    appear as probes; (3) two shuffle-hash verify joins against the
    per-doc sorted arrays. ``max_prefix_freq`` optionally drops probe
    tokens rarer than nothing but hotter than the limit for
    adversarial corpora (breaks exactness; off by default).
    """
    from .cache import track_cache

    if not (0 < threshold_micro <= 1_000_000):
        raise ValueError(f"threshold_micro must be in (0, 1e6], got {threshold_micro}")

    def ceil_t(ncol):
        # exact integer ceil(t*n) — float ceil overshoots at exact
        # multiples (see jaccard_prefix_pairs)
        return (
            (ncol * F.lit(threshold_micro) + F.lit(999_999)) / F.lit(1_000_000)
        ).cast("bigint")

    idx = shingle_index(df, text_col, id_col, n, hashed=True).persist()
    freq = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_cnt"))
    from pyspark.sql import Window

    ranked = idx.join(freq.hint("shuffle_hash"), "shingle")
    w_ord = Window.partitionBy("doc").orderBy("df_cnt", "shingle")
    w_all = Window.partitionBy("doc")
    ranked = ranked.select(
        "doc",
        "shingle",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_sh"),
    )
    # prefix as POTENTIAL MIN SIDE: length m - ceil(t*m) + 1 of the
    # doc's own size (for the pair's actual min side this is exactly
    # the lemma's bound; for the larger side it is harmless extra
    # probes). Docs below min_shingles never qualify — skip entirely.
    ranked = ranked.persist()
    prefix = ranked.filter(
        (F.col("n_sh") >= F.lit(int(min_shingles)))
        & (F.col("rn") <= F.col("n_sh") - ceil_t(F.col("n_sh")) + 1)
    ).select("doc", "shingle", "rn", "n_sh")
    if max_prefix_freq is not None:
        hot = freq.filter(F.col("df_cnt") > max_prefix_freq).select("shingle")
        prefix = prefix.join(hot.hint("shuffle_hash"), "shingle", "left_anti")
    full = ranked.select(
        F.col("doc").alias("doc_full"),
        "shingle",
        F.col("rn").alias("rn_f"),
        F.col("n_sh").alias("n_f"),
    )
    # positional prune (PPJoin Lemma 2 adapted to overlap): for a
    # pair's FIRST shared token in the global rarest-first order, the
    # achievable common is at most 1 + min(remaining on each side),
    # while O >= t needs common >= ceil(t*min(sizes)). A qualifying
    # pair always survives via its first-shared occurrence, so
    # dropping occurrences that fail the bound is lossless — and it is
    # what keeps the probe-vs-full join from materializing every
    # co-occurrence on saturated corpora where no token is rare.
    cands = (
        prefix.join(full.hint("shuffle_hash"), "shingle")
        .filter(F.col("doc") != F.col("doc_full"))
        .filter(
            1
            + F.least(
                F.col("n_sh") - F.col("rn"), F.col("n_f") - F.col("rn_f")
            )
            >= ceil_t(F.least(F.col("n_sh"), F.col("n_f")))
        )
        .select(
            F.least("doc", "doc_full").alias("id_a"),
            F.greatest("doc", "doc_full").alias("id_b"),
        )
        .distinct()
    )
    doc_sets = idx.groupBy("doc").agg(
        F.sort_array(F.collect_list("shingle")).alias("sh_set"),
        F.count(F.lit(1)).alias("n_sh"),
    )
    sa = doc_sets.select(
        F.col("doc").alias("id_a"),
        F.col("sh_set").alias("set_a"),
        F.col("n_sh").alias("n_a"),
    )
    sb = doc_sets.select(
        F.col("doc").alias("id_b"),
        F.col("sh_set").alias("set_b"),
        F.col("n_sh").alias("n_b"),
    )
    mega = F.lit(1_000_000).cast("bigint")
    # the candidate frame must never broadcast (stale post-agg
    # estimates promoted the pair side on sf1 sibling runs); pin the
    # doc-set build sides
    scored = (
        cands.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .withColumn(
            "common", F.size(F.array_intersect("set_a", "set_b")).cast("bigint")
        )
        .withColumn("min_sh", F.least(F.col("n_a"), F.col("n_b")).cast("bigint"))
    )
    num = mega * F.col("common")
    out = scored.filter(
        (F.col("min_sh") >= F.lit(int(min_shingles)))
        & (num >= F.lit(int(threshold_micro)) * F.col("min_sh"))
    ).select(
        "id_a",
        "id_b",
        "common",
        "min_sh",
        ((num - num % F.col("min_sh")) / F.col("min_sh"))
        .cast("bigint")
        .alias("containment_micro"),
    )
    return track_cache(out, idx, ranked)


def jaccard_prefix_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_prefix_freq: int | None = None,
) -> DataFrame:
    """EXACT threshold-Jaccard pair join via prefix filtering (the
    AllPairs/PPJoin candidate scheme — Bayardo et al. WWW'07, Xiao et
    al. WWW'08) — no doc-frequency cap needed for exactness, unlike
    :func:`jaccard_pairs` whose ``max_doc_freq`` changes the computed
    Jaccard values.

    Scheme: order every doc's shingles by ASCENDING global document
    frequency (rarest first; shingle hash tiebreak — any fixed total
    order works, this one minimizes posting sizes). J(x,y) >= t
    implies |x ∩ y| >= ceil(t*max(|x|,|y|)), and by the prefix lemma
    the two prefixes of length |x| - ceil(t*|x|) + 1 must then share
    a token — so candidate pairs come from posting lists of PREFIX
    tokens only (the rarest ~(1-t) fraction of each doc), and each
    candidate is verified exactly against the full shingle sets.

    100 TB shape: three shuffles — (1) shingle-df join + per-doc rank
    window (partitioned by doc, bounded by doc length), (2) prefix
    posting-list expansion grouped by shingle (lists are short by
    construction: prefixes hold the rarest tokens), (3) candidate
    verification via two shuffle-hash joins against the per-doc sorted
    shingle arrays (array_intersect per candidate — never a corpus
    self-join). The length filter t*|x| <= |y| <= |x|/t prunes
    candidates before the verify joins. ``max_prefix_freq`` optionally
    caps prefix posting lists for adversarial corpora (near-identical
    docs make even rare-token postings hot); it trades recall and is
    OFF by default because it breaks the exactness contract.
    """
    from .cache import track_cache

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    # ceil(t*n) in EXACT integer arithmetic: IEEE 0.8*5 is
    # 4.0000000000000002, so a float F.ceil would overshoot to 5 at
    # every exact-multiple boundary — shortening the prefix and
    # silently breaking the completeness lemma. t is taken to micro
    # precision (every realistic threshold is a short decimal).
    t_micro = round(threshold * 1_000_000)

    def ceil_t(ncol):
        return ((ncol * F.lit(t_micro) + F.lit(999_999)) / F.lit(1_000_000)).cast(
            "bigint"
        )

    idx = shingle_index(df, text_col, id_col, n, hashed=True).persist()
    freq = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_cnt"))
    # rarest-first total order; the df join shuffles on shingle and is
    # reused by nothing downstream, but the df table is corpus-sized
    # (one row per distinct shingle) — never broadcastable; pin it
    from pyspark.sql import Window

    ranked = idx.join(freq.hint("shuffle_hash"), "shingle")
    w_ord = Window.partitionBy("doc").orderBy("df_cnt", "shingle")
    w_all = Window.partitionBy("doc")
    ranked = ranked.select(
        "doc",
        "shingle",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_sh"),
    )
    prefix = ranked.filter(F.col("rn") <= F.col("n_sh") - ceil_t(F.col("n_sh")) + 1)
    if max_prefix_freq is not None:
        hot = freq.filter(F.col("df_cnt") > max_prefix_freq).select("shingle")
        prefix = prefix.join(hot.hint("shuffle_hash"), "shingle", "left_anti")
    # posting lists keep each doc's prefix POSITION and size so pair
    # expansion can apply PPJoin's positional filter (Xiao et al.
    # WWW'08 Lemma 2): for a pair's FIRST shared prefix token (no
    # common token precedes it in the global order), the achievable
    # overlap is at most 1 + min(|x| - rn_x, |y| - rn_y), while
    # J >= t needs overlap >= ceil(t/(1+t) * (|x|+|y|)). A pair
    # survives if ANY of its shared-token occurrences passes — the
    # first-shared occurrence always does for a true pair, so the
    # prune is lossless; it cuts the candidate set BEFORE the verify
    # joins (the expensive stage on high-df corpora). alpha is exact
    # integer arithmetic for the same reason as ceil_t.
    alpha_den = 1_000_000 + t_micro
    # the LENGTH filter (J >= t forces t*max(|x|,|y|) <= min(|x|,|y|),
    # exact integer form: 1e6*min >= t_micro*max) also runs HERE, not
    # only after the verify joins — both sizes already sit in the
    # posting structs, so evaluating it per expanded pair is free and
    # prunes candidates BEFORE the distinct + two shuffle-hash verify
    # joins (guide §2.3: reduce before the shuffle). Lossless: it is
    # a necessary condition of J >= t, and the post-join filter stays
    # as the defensive second line.
    pair_expr = (
        "flatten(transform(ds, (x, i) -> "
        "transform(filter(slice(ds, i + 2, size(ds)), "
        f"y -> 1000000 * least(x.n_sh, y.n_sh) >= "
        f"{t_micro} * greatest(x.n_sh, y.n_sh) "
        "AND CAST(1 + least(x.n_sh - x.rn, y.n_sh - y.rn) AS BIGINT) >= "
        f"CAST(({t_micro} * (x.n_sh + y.n_sh) + {alpha_den - 1}) "
        f"/ {alpha_den} AS BIGINT)), "
        "y -> struct(x.doc AS id_a, y.doc AS id_b))))"
    )
    posting = prefix.groupBy("shingle").agg(
        F.sort_array(F.collect_list(F.struct("doc", "rn", "n_sh"))).alias("ds")
    )
    cands = (
        posting.filter(F.size("ds") > 1)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    doc_sets = idx.groupBy("doc").agg(
        F.sort_array(F.collect_list("shingle")).alias("sh_set"),
        F.count(F.lit(1)).alias("n_sh"),
    )
    sa = doc_sets.select(
        F.col("doc").alias("id_a"),
        F.col("sh_set").alias("set_a"),
        F.col("n_sh").alias("n_a"),
    )
    sb = doc_sets.select(
        F.col("doc").alias("id_b"),
        F.col("sh_set").alias("set_b"),
        F.col("n_sh").alias("n_b"),
    )
    # the candidate frame is the one that must never broadcast
    # (O(candidates) off a stale post-agg estimate OOMed sf1 runs of
    # the sibling jaccard_pairs); pin the doc-set build sides
    verified = (
        cands.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        # length filter: J >= t forces t <= n_a/n_b <= 1/t
        .filter(
            (F.col("n_b") >= ceil_t(F.col("n_a")))
            & (F.col("n_a") >= ceil_t(F.col("n_b")))
        )
        .withColumn("common", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return track_cache(verified, idx)


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.3,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Approximate near-dup pairs via MinHashLSH over hashed shingle
    sets. The scale path: banded LSH means join cost tracks the number
    of true near-dup candidates instead of |docs|^2.

    Returns (id_a < id_b, jaccard_distance approx).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = fan_out(df, id_col).select(
        F.col(id_col).alias("doc"), shingles(F.col(text_col), n).alias("sh")
    ).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    # both sides of the self-join read this frame; persist so shingling
    # + hashing run once, not twice
    feats = tf.transform(sh).persist()
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=7)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, max_jaccard_distance, distCol="dist")
    return (
        pairs.select(
            F.col("datasetA.doc").alias("id_a"),
            F.col("datasetB.doc").alias("id_b"),
            F.col("dist").alias("jaccard_distance"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def simhash64(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """64-bit SimHash fingerprint per document (Charikar, "Similarity
    estimation techniques from rounding algorithms", STOC 2002; used
    for web-scale dedup per Manku/Jain/Das Sarma, WWW 2007).

    Each distinct word ``n``-gram shingle hashes to 64 bits (xxhash64);
    per bit, votes +1/-1 summed over shingles; the sign vector is the
    fingerprint, emitted as a 16-hex-char string plus four 16-bit bands
    for hamming-banded candidate generation. Shingles (not unigrams)
    are the feature set: on small-vocabulary corpora most documents
    contain most words, so unigram SimHash degenerates — n-grams carry
    word order and keep fingerprints discriminative. One explode + one
    grouped agg — linear in corpus size.
    """
    toks = fan_out(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    # reassemble sign bits into 4 x 16-bit band integers (driver-side
    # expression build, executor-side evaluation)
    bands = []
    for band in range(4):
        expr = F.lit(0).cast("long")
        for j in range(16):
            i = band * 16 + j
            expr = expr + F.when(F.col(f"b{i}") > 0, F.lit(1 << j).cast("long")).otherwise(0)
        bands.append(expr.alias(f"band{band}"))
    out = votes.select(F.col("doc"), *bands)
    hexs = [F.lpad(F.hex(F.col(f"band{b}")), 4, "0") for b in (3, 2, 1, 0)]
    return out.withColumn("simhash", F.concat(*hexs))


def simhash_candidate_pairs(
    sim: DataFrame,
    max_hamming: int = 3,
    hot_band_threshold: int = 1024,
    salt_buckets: int = 8,
) -> DataFrame:
    """Near-dup candidates from :func:`simhash64` output: docs sharing
    any 16-bit band, filtered to true hamming distance <= max_hamming.

    Band rows melt to (doc, band_key = hash(band index, band value))
    and candidate ids come from one salted self-join
    (:func:`~big_data_tools_spark.operators.skew.salted_self_pairs`):
    hot bands — near-constant regions hash most docs into the same
    band value — split across reducers, pairs dedup BEFORE the hamming
    computation (the old 4-way union computed hamming once per shared
    band). Release tagged caches via ``operators.cache.release_caches``.
    """
    from .cache import track_cache
    from .skew import salted_self_pairs

    bands = ["band0", "band1", "band2", "band3"]
    melted = sim.select(
        "doc",
        F.explode(
            F.array(*[F.xxhash64(F.lit(i), F.col(b)) for i, b in enumerate(bands)])
        ).alias("band_key"),
    )
    cand = salted_self_pairs(
        melted,
        id_col="doc",
        key_col="band_key",
        hot_threshold=hot_band_threshold,
        salt_buckets=salt_buckets,
    )
    pop = None
    for b in bands:
        x = F.bit_count(F.col(f"a.{b}").bitwiseXOR(F.col(f"b.{b}")))
        pop = x if pop is None else pop + x
    out = (
        cand.join(sim.alias("a"), cand["id_a"] == F.col("a.doc"))
        .join(sim.alias("b"), cand["id_b"] == F.col("b.doc"))
        .select("id_a", "id_b", pop.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
    return track_cache(out, cand)


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_digits: int = 4,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Embedding near-dup: (id_a < id_b) pairs with cosine >= threshold.

    Exact all-pairs form — the correctness baseline and oracle twin for
    the approximate tiers. Cosine is computed in double with per-pair
    rounding BEFORE the threshold filter so the boundary decision is
    identical across engines.

    SCALE GUARD: the plan is a broadcast nested loop over all (i < j)
    pairs by construction (non-equi condition) — O(n^2) work and an
    O(n) broadcast. It exists as the small-corpus oracle; above
    ``max_rows`` rows it raises and points at the bucketed tiers
    (:func:`minhash_band_pairs`,
    :func:`big_data_tools_spark.operators.similarity.lsh_ann_topk`,
    ``ivf_topk``) whose cost tracks near-dup density instead of n^2.
    Pass ``max_rows=None`` to explicitly opt out (tests, known-small
    frames).
    """
    from .similarity import _as_double, dot, l2_norm

    if max_rows is not None:
        n = df.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"embedding_cosine_pairs is an exact all-pairs baseline; corpus has "
                f"> {max_rows} rows ({n}+). Use the bucketed scale paths instead: "
                "operators.dedup.minhash_band_pairs (text), "
                "operators.similarity.lsh_ann_topk / ivf_topk (embeddings), "
                "or pass max_rows=None to force the O(n^2) plan."
            )

    # norms + float->double casts hoisted to per-ROW projections (the
    # r11 brute_force_topk/IvfIndex.search recipe): computing
    # cosine(va, vb) per pair pays both L2 norms and two array casts
    # per candidate — 3x the element work of the dot product. Same
    # expression tree on identical doubles => bit-identical sims.
    a = fan_out(df, id_col).select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")
    ).withColumn("__na", l2_norm(F.col("va")))
    b = df.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")
    ).withColumn("__nb", l2_norm(F.col("vb")))
    sim = F.round(
        dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb")),
        round_digits,
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def minhash_band_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 16,
    threshold: float = 0.7,
    hot_band_threshold: int = 1024,
    salt_buckets: int = 8,
) -> DataFrame:
    """MinHash+LSH near-dup pairs as pure Catalyst expressions — no ML
    stage, no UDFs, no Python on executors.

    MinHash per Broder, "On the resemblance and containment of
    documents" (1997); banding per Leskovec/Rajaraman/Ullman, Mining
    of Massive Datasets ch.3. Signatures use ONE-PERMUTATION hashing
    (Li, Owen & Zhang, "One Permutation Hashing", NeurIPS 2012, with
    seeded-fallback densification): each shingle is hashed
    once (the inverted index already carries xxhash64 shingles);
    component i is the min shingle hash landing in bucket
    ``pmod(hash, num_hashes) = i``, computed as a grouped min over the
    exploded index — hash work is O(|shingles|), not
    O(num_hashes x |shingles|) like classic per-seed MinHash. Empty
    buckets (short docs) densify with a seeded hash of the doc's min
    shingle (deterministic; identical docs still collide).

    Bands of r = num_hashes/bands components hash to band keys; docs
    sharing any band key become candidates (the LSH step: join cost
    tracks near-dup density, not |docs|^2). Band rows carry ids only —
    shingle-set arrays join back once per side AFTER pair dedup.
    Candidates get EXACT Jaccard over the hashed shingle sets
    (``array_intersect``), filtered to ``>= threshold``.

    P(candidate | jaccard=j) = 1-(1-j^r)^bands: r=3, bands=16 keeps
    recall >0.99 at j>=0.7 (measured 0.98 vs exact at sf0.1).

    Hot bands (boilerplate-heavy corpora put thousands of docs behind
    one band key) are split across reducers by
    :func:`~big_data_tools_spark.operators.skew.salted_self_pairs`
    (``hot_band_threshold`` / ``salt_buckets``) — candidate set, and
    therefore recall, identical to the direct self-join. Persisted
    intermediates are tagged on the result; callers release them after
    their action via ``operators.cache.release_caches``.
    """
    from .cache import track_cache
    from .skew import salted_self_pairs

    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands

    # idx feeds two consumers (bucket mins + exact-confirm sets);
    # persist so shingling runs once, not twice
    idx = shingle_index(df, text_col, id_col, n, hashed=True).persist()
    mins = (
        idx.withColumn("bucket", F.expr(f"pmod(shingle, {num_hashes})"))
        .groupBy("doc", "bucket")
        .agg(F.min("shingle").alias("mn"))
    )
    sigm = mins.groupBy("doc").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "mn"))).alias("m"),
        F.min("mn").alias("gmin"),
    )
    signed = sigm.select(
        "doc",
        F.expr(
            f"transform(sequence(0, {num_hashes - 1}, 1), "
            "i -> coalesce(m[i], xxhash64(gmin, i)))"
        ).alias("sig"),
    )
    band_keys = F.array(
        *[
            F.xxhash64(F.lit(b), *[F.expr(f"sig[{b * r + j}]") for j in range(r)])
            for b in range(bands)
        ]
    )
    banded = signed.select("doc", F.explode(band_keys).alias("band_key"))
    cand = salted_self_pairs(
        banded,
        id_col="doc",
        key_col="band_key",
        hot_threshold=hot_band_threshold,
        salt_buckets=salt_buckets,
    )
    sets = idx.groupBy("doc").agg(F.collect_set("shingle").alias("xs"))
    pairs = (
        cand.join(sets.select(F.col("doc").alias("id_a"), F.col("xs").alias("xa")), "id_a")
        .join(sets.select(F.col("doc").alias("id_b"), F.col("xs").alias("xb")), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("xa"), F.col("xb")))
    union = F.size(F.col("xa")) + F.size(F.col("xb")) - inter
    out = (
        pairs.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return track_cache(out, idx, cand)




def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 3,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """Near-dup candidates via winnowing fingerprints (Schleimer/
    Wilkerson/Aiken, SIGMOD 2003): (id_a < id_b, shared) pairs of
    documents sharing at least ``min_shared`` fingerprints.

    Scale shape: posting-list self-join on the 8-byte fingerprint —
    cost tracks shared-content density, never all-pairs. ``max_doc_freq``
    drops fingerprints present in more than that many docs (boilerplate
    guard, same idea as :func:`jaccard_pairs`). Fingerprints come from
    :func:`big_data_tools_spark.operators.text.with_winnow_fingerprints`
    (pure column exprs, oracle-checkable); the winnowing guarantee
    means any shared run of >= K + W - 1 normalized chars surfaces at
    least one shared fingerprint.
    """
    from .cache import track_cache
    from .text import with_winnow_fingerprints

    # fingerprinting is the compute-heavy per-row step — spread
    # single-file inputs across all cores before it (no-op at scale)
    fps = with_winnow_fingerprints(
        fan_out(df, id_col).select(F.col(id_col).alias("doc"), text_col),
        text_col,
        "fp_set",
    )
    # explode_OUTER, then drop the null rows ourselves: plain explode
    # triggers InferFiltersFromGenerate, whose `size(fp_set) > 0` filter
    # gets predicate-pushed below the fingerprint projections with the
    # whole expression tree inlined — re-evaluating the hash array
    # inside every per-element lambda (O(n^3) per row; measured as a
    # multi-minute hang on 500 docs). The infer rule skips outer
    # generators, and the isNotNull filter on the GENERATED attribute
    # cannot be pushed below the Generate.
    idx = (
        fps.select("doc", F.explode_outer("fp_set").alias("fp"))
        .filter(F.col("fp").isNotNull())
        .persist()
    )
    capped = idx
    if max_doc_freq is not None:
        # broadcast the (small) HOT set and anti-join — broadcasting the
        # keep-set would ship nearly every distinct fingerprint
        freq = idx.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
        hot = freq.filter(F.col("df") > max_doc_freq).select("fp")
        capped = idx.join(F.broadcast(hot), "fp", "left_anti")
    a = capped.select(F.col("doc").alias("id_a"), "fp")
    b = capped.select(F.col("doc").alias("id_b"), "fp")
    out = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return track_cache(out, idx)


def minhash_band_pairs_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    hot_band_threshold: int = 1024,
    salt_buckets: int = 8,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with an ENGINE-PORTABLE hash family
    (md5/16 hex strings, minimum = lexicographic min), so the full
    pipeline — signatures, banding, candidate join, exact confirm —
    has a bit-exact DuckDB oracle twin. The xxhash64 one-permutation
    variant (:func:`minhash_band_pairs`) stays the production path:
    one hash per shingle vs ``num_hashes`` md5s per shingle here, and
    8-byte int keys vs 16-char strings. This variant exists so the
    LSH *semantics* carry a hard correctness signal, priced at
    ~num_hashes x the hash work (amortized by the same grouped-agg
    shape: signature component i is min(md5(i|shingle)) — all
    ``num_hashes`` mins computed in ONE grouped aggregate pass over
    the exploded index, no per-seed scans).

    Candidate generation reuses the salted band self-join
    (``skew.salted_self_pairs``), so the skew story is identical to
    the production variant; candidates confirm with exact Jaccard
    over the shingle-string sets and filter to ``>= threshold``.
    P(candidate | j) = 1-(1-j^r)^bands with r = num_hashes/bands:
    the 16/8 default keeps recall >0.999 at j>=0.8.
    """
    from .cache import track_cache
    from .skew import salted_self_pairs

    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands

    idx = shingle_index(df, text_col, id_col, n, hashed=False).persist()
    # 4 signature components per salted md5 (disjoint 8-hex substrings
    # of one 32-hex digest) — 4x fewer hash calls than one-md5-per-
    # component; 32-bit component mins keep band-collision probability
    # negligible and the exact-Jaccard confirm filters what remains
    comps = [
        F.min(
            F.substring(
                F.md5(
                    F.concat_ws("|", F.lit(str(i // 4)), F.col("shingle"))
                ),
                8 * (i % 4) + 1,
                8,
            )
        ).alias(f"s{i}")
        for i in range(num_hashes)
    ]
    sig = idx.groupBy("doc").agg(*comps)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", F.lit(str(b)), *[F.col(f"s{b * r + j}") for j in range(r)]
            )
        )
        for b in range(bands)
    ]
    banded = sig.select("doc", F.explode(F.array(*band_cols)).alias("band_key"))
    cand = salted_self_pairs(
        banded,
        id_col="doc",
        key_col="band_key",
        hot_threshold=hot_band_threshold,
        salt_buckets=salt_buckets,
    )
    sets = idx.groupBy("doc").agg(F.collect_set("shingle").alias("xs"))
    pairs = (
        cand.join(
            sets.select(F.col("doc").alias("id_a"), F.col("xs").alias("xa")), "id_a"
        )
        .join(
            sets.select(F.col("doc").alias("id_b"), F.col("xs").alias("xb")), "id_b"
        )
    )
    inter = F.size(F.array_intersect(F.col("xa"), F.col("xb")))
    union = F.size("xa") + F.size("xb") - inter
    out = (
        pairs.withColumn("jaccard_raw", inter / union)
        .filter(F.col("jaccard_raw") >= threshold)
        .select(
            "id_a", "id_b", F.round(F.col("jaccard_raw"), 6).alias("jaccard")
        )
    )
    return track_cache(out, idx)


def simhash_band_pairs_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    hamming_threshold: int = 3,
    hot_band_threshold: int = 1024,
    salt_buckets: int = 8,
) -> DataFrame:
    """64-bit SimHash (Charikar 2002; Manku et al. WWW'07 for the
    banded dedup form) near-dup pairs with an ENGINE-PORTABLE hash
    family, completing the portable-oracle pair with
    :func:`minhash_band_pairs_portable`: feature hashes are md5
    nibbles, so DuckDB replays signatures, banding, candidates, and
    the hamming confirm bit-for-bit.

    Construction: each 3-gram shingle's first 16 md5 hex chars give 64
    feature bits; per (doc, bit) the classic +1/-1 vote sums in ONE
    grouped aggregate (64 conditional sums — partial-agg friendly);
    the signature materializes as FOUR 16-bit band values (no 2^63
    overflow games), band membership keys ``i * 2^16 + value``, the
    candidate self-join is salted (same skew machinery as every LSH
    tier), and candidates confirm with hamming distance = sum of
    bit_count over the four band XORs, kept ``<= hamming_threshold``.

    Scale: the vote aggregate is the only pass over the token stream;
    banding explodes 4 rows/doc; the candidate join tracks near-dup
    density like every banded tier. Returns (id_a, id_b, hamming).
    """
    from .cache import track_cache
    from .skew import salted_self_pairs

    idx = shingle_index(df, text_col, id_col, n, hashed=False)
    h = F.md5(F.col("shingle"))
    # two 8-hex-char converts give all 16 nibbles as bit ranges of two
    # 32-bit ints — 8x fewer conv() calls than per-nibble extraction,
    # identical bit values: nibble j sits at bits [4*(7 - j%8)] of the
    # half containing it, so bit b = (half >> (4*(7 - (b//4)%8) +
    # (3 - b%4))) & 1 (verified equal by the unchanged DuckDB oracle)
    halves = idx.select(
        "doc",
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint").alias("h0"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint").alias("h1"),
    )

    def _bit(b: int):
        j = b // 4  # hex-char index 0..15
        half = F.col("h0") if j < 8 else F.col("h1")
        shift = 4 * (7 - (j % 8)) + (3 - b % 4)
        return F.shiftright(half, shift).bitwiseAND(F.lit(1))

    votes = halves.groupBy("doc").agg(
        *[F.sum(_bit(b) * 2 - 1).alias(f"c{b}") for b in range(64)]
    )
    band_cols = []
    for i in range(4):
        expr = None
        for b in range(16 * i, 16 * i + 16):
            term = F.when(F.col(f"c{b}") > 0, F.lit(1 << (b - 16 * i))).otherwise(
                F.lit(0)
            )
            expr = term if expr is None else expr + term
        band_cols.append(expr.cast("long").alias(f"b{i}"))
    sig = votes.select("doc", *band_cols).persist()

    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    (F.lit(i * 65536) + F.col(f"b{i}")).cast("long")
                    for i in range(4)
                ]
            )
        ).alias("band_key"),
    )
    cand = salted_self_pairs(
        banded,
        id_col="doc",
        key_col="band_key",
        hot_threshold=hot_band_threshold,
        salt_buckets=salt_buckets,
    )
    a = sig.select(
        F.col("doc").alias("id_a"), *[F.col(f"b{i}").alias(f"xa{i}") for i in range(4)]
    )
    b_ = sig.select(
        F.col("doc").alias("id_b"), *[F.col(f"b{i}").alias(f"xb{i}") for i in range(4)]
    )
    hamming = None
    for i in range(4):
        t = F.bit_count(F.col(f"xa{i}").bitwiseXOR(F.col(f"xb{i}")))
        hamming = t if hamming is None else hamming + t
    out = (
        cand.join(a, "id_a")
        .join(b_, "id_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= hamming_threshold)
        .select("id_a", "id_b", "hamming")
    )
    return track_cache(out, sig)


def lsh_banding_plan(
    threshold: float,
    num_hashes: int = 48,
    target_fn_rate: float = 0.05,
) -> dict:
    """Choose the (bands, rows-per-band) split of a ``num_hashes``-
    component MinHash signature for a target Jaccard ``threshold`` —
    the tuning companion to :func:`minhash_band_pairs`.

    Banding gives an S-curve: a pair with true Jaccard s becomes a
    candidate with probability ``1 - (1 - s^r)^b``. Among the valid
    (b, r) factorizations (b x r = num_hashes), pick the one whose
    false-negative rate AT the threshold (``(1 - t^r)^b``) is under
    ``target_fn_rate`` while maximizing r (larger r = steeper curve =
    fewer sub-threshold candidates, i.e. less wasted exact-Jaccard
    confirm work — the right bias because the confirm step already
    guarantees precision, so candidates below the threshold are pure
    cost). Falls back to the factorization with the LOWEST
    false-negative rate if none meets the target (caller should then
    raise num_hashes).

    Pure math on the driver (no Spark): returns {bands, rows,
    fn_rate_at_threshold, curve} where curve maps sample similarities
    to candidate probabilities — print it before committing a corpus
    pass. Cited curve: MMDS ch.3 (Leskovec/Rajaraman/Ullman).
    """
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    options = [
        (num_hashes // r, r)
        for r in range(1, num_hashes + 1)
        if num_hashes % r == 0
    ]

    def fn_rate(b: int, r: int) -> float:
        return (1.0 - threshold**r) ** b

    meeting = [(b, r) for b, r in options if fn_rate(b, r) <= target_fn_rate]
    if meeting:
        b, r = max(meeting, key=lambda br: br[1])
    else:
        b, r = min(options, key=lambda br: fn_rate(*br))
    curve = {
        round(s, 2): round(1.0 - (1.0 - s**r) ** b, 4)
        for s in (0.1, 0.3, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)
    }
    return {
        "bands": b,
        "rows": r,
        "fn_rate_at_threshold": round(fn_rate(b, r), 6),
        "curve": curve,
    }
