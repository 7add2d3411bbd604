#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (foreachBatch-free: count() on the
result forces full evaluation including sinks-side work) on
local[$SPARK_GRAFT_CPUS]. The metric is total wall-clock across the
headline set.

Two artifacts beyond stdout (both round-6 additions):
- ``BENCH_SUMMARY.json``: compact sidecar rewritten atomically after
  EVERY timed query, so a truncated stdout capture or a mid-run death
  still leaves a complete, parseable per-query map (BENCH_r05.json
  lost its head to the driver's finite capture buffer).
- ``canary_sec``: a fixed machine-speed probe timed before the
  headline set. This box swings 1.2-1.8x with co-tenant load, so
  round-over-round walls are only comparable as ratios to the canary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_tools_spark.queries import all_queries
from big_data_tools_spark.session import get_spark

# Representative of every operator family: scan+agg, star join, window,
# pivot, semi-structured parse, text, dedup (exact + jaccard + minhash),
# similarity (brute + LSH), temporal as-of join, time-range sliding
# window. (knn_ivf_ann is excluded: its per-run KMeans fit measures
# model training, not query execution — LSH represents the ANN path.)
HEADLINE = [
    "order_rollup_flagship",
    "pricing_summary",
    "regional_revenue",
    "nation_customer_value",
    "topk_orders_per_customer",
    "segment_pivot",
    "monthly_revenue",
    "events_props_extract",
    "events_hourly",
    "doc_quality_by_source",
    "lang_id_confusion",
    "dedup_exact_docs",
    "dedup_jaccard_pairs",
    "dedup_minhash_pairs",
    "knn_cosine_brute",
    "knn_lsh_ann",
    "purchase_last_click_asof",
    "user_value_sliding_1h",
    # widest plans in the repo — benched so regressions are visible
    # round-over-round (VERDICT.md r1 #8)
    "tfidf_top_terms",
    "purchase_click_window",
    "dedup_components",
    # round-2 additions: winnowing tier, int8 ANN, composed capstone,
    # contamination sweep, SemDeDup (KMeans fit + in-cluster scan)
    "dedup_winnow_pairs",
    "knn_cosine_int8",
    "pretraining_corpus_pipeline",
    "benchmark_contamination",
    "dedup_semantic_groups",
    # round-2b: SCD-2 merge (full-outer + explode) and the Q21 window
    # rewrite (widest single-shuffle window plan)
    "customer_scd2_merge",
    "waiting_supplier_lines",
    # round-3: BM25 retrieval + unigram-LM quality filter (broadcast
    # model join over the exploded token stream)
    "bm25_topk_docs",
    "doc_perplexity_by_source",
    # round-3b: segment-level dedup (segment-hash agg + reassembly)
    # and DSIR selection (widest feature stream in the repo — unigram
    # + bigram explode scored against a broadcast log-ratio model)
    "dedup_segments_reassembled",
    "dsir_target_selection",
    # round-3c: TPC-H fill-in representatives (pushdown probe, top-k
    # star, deep star profit, zero-preserving distribution, window
    # dominance), hybrid RRF fusion, CDC materialization, and the
    # ExactSubstr-style span coverage (position-gram explode — the
    # widest text intermediate after DSIR)
    "narrow_discount_revenue",
    "segment_top_open_orders",
    "nation_product_profit",
    "customer_order_count_distribution",
    "dominant_part_suppliers",
    "hybrid_rrf_topk",
    "user_current_state_cdc",
    "dedup_span_coverage",
    # round-3d: portable-hash dedup tiers (bit-exact oracle variants),
    # snapshot diff (full-outer change detect), skew diagnostics
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "orders_snapshot_diff",
    "orders_custkey_skew",
    "orders_pit_segment_revenue",
    "documents_weighted_sample",
    # round-4: skip-gram pair stream (widest pure-expression fan-out),
    # vocabulary OOV (token-stream shuffle + broadcast top-V), rolling
    # DAU (bounded date fan-out + per-day distinct), cross-source
    # overlap (fingerprint source-set build)
    "token_skipgram_counts",
    "vocab_oov_rate",
    "events_rolling_dau",
    "source_overlap_matrix",
    # iterative-graph representative (5 join+agg rounds, one static
    # plan); triangles stay OUT — output-bound wedge growth makes the
    # number track graph density, not engine regressions (SCALING.md)
    "part_copurchase_pagerank",
    # round-4 final session: LPA (per-round join + two hash aggs —
    # the second iterative-graph shape), mergeable histogram-quantile
    # merge path, and the Holt F.aggregate fold (array-expression
    # heavy; regression canary for lambda-function codegen)
    "part_copurchase_communities",
    "orders_incremental_quantile",
    "monthly_revenue_forecast",
    # round-5: k-core peel (monotone-shrink iterative shape — the
    # third graph loop), Adamic-Adar (wedge join + candidate-grain
    # anti-join), Zipf fit (token explode -> bounded TakeOrdered ->
    # closed-form OLS), bigram backoff NLL (n-gram grain joins +
    # quantized log sums)
    "copurchase_kcore_peel",
    "copurchase_adamic_adar",
    "corpus_zipf_fit",
    "doc_bigram_backoff_nll",
    # round-5b: calendar-lag ACF (day-grain lag fan-out join — shuffle
    # volume independent of fact cardinality), the tie-closed-form
    # Gini (value-group window over a two-level reduction), and the
    # prefix-filtered exact Jaccard (PPJoin candidate scheme — the
    # uncapped-exactness counterpart of dedup_jaccard_pairs)
    "daily_revenue_acf",
    "segment_revenue_gini",
    "dedup_jaccard_prefix",
    # round-5c: calendar-bounded pairwise trend stats, the
    # distinct-value-grain rank correlation, the Kaplan-Meier fold,
    # and the Markov-attribution nested-HOF fold (codegen canaries
    # for lambda-function expression trees)
    "daily_revenue_trend_robust",
    "discount_quantity_spearman",
    "customer_reorder_survival",
    "purchase_markov_attribution",
    # round-6: HITS (the localCheckpoint-barrier iterative shape —
    # per-half-step materialization cost is what this canaries),
    # the embedding outlier audit (centroid broadcast + array-fold
    # cosine over the full corpus), and the CUSUM-argmax changepoint
    # (day-grain prefix-sum window + TakeOrdered)
    "purchase_hits_scores",
    "embedding_outlier_audit",
    "daily_revenue_changepoint",
    # round-7 wave: the transactional merge path (create + CoW merge +
    # snapshot rollup), the integer KS drift (two-level prefix sum),
    # the wedge-join clustering coefficient, and the double brute-pass
    # Matryoshka audit
    "orders_merge_upsert_rollup",
    "orders_price_ks",
    "copurchase_clustering_coefficient",
    "embedding_matryoshka_audit",
    # round-7 second wave: the CMS sketch build (4x explode + bounded
    # cell agg), the Bloom probe (3x explode + broadcast position
    # join), and the type-table coverage curve (corpus explode +
    # vocab-bounded rank window)
    "events_cms_heavy_hitters",
    "bloom_semijoin_audit",
    "vocab_coverage_curve",
    # third wave: the bigram-grain entropy fold is the widest new plan
    "corpus_ngram_entropy",
    # fourth wave: the wedge-closure bridge census (the heaviest graph
    # one-shot beside triangles)
    "copurchase_local_bridges",
    # round-8 wave: the token-grain drift JSD (corpus explode + two
    # portable-ln KL folds — the widest new text plan), the rank-sum U
    # (second two-level prefix-sum consumer), the KMV set-algebra
    # triple sketch, and the perceptual aHash decode (the image-decode
    # Arrow-boundary canary)
    "corpus_token_drift",
    "orders_mannwhitney",
    "events_kmv_setops",
    "multimodal_image_ahash_dedup",
    # round-9 wave: containment (second posting-list pair consumer —
    # canaries the shared inverted-index path at a different
    # threshold), the FD audit (pure per-candidate agg fan), the
    # hubness k-occurrence audit (the all-pairs cosine + left-join
    # shape), and the k-group ANOVA rollup
    "dedup_containment_pairs",
    "orders_fd_violations",
    "embedding_hubness_audit",
    "events_value_anova",
    # round-10 wave: the exact prefix-containment tier (uncapped
    # posting exactness at bench scale). embedding_hubness_audit_ann
    # is deliberately NOT seated here — at sf0.1 the ANN tier costs
    # more than the brute audit (IVF fit + a few-key cluster-id join
    # vs one codegen broadcast scan; crossover is ~100k+ vectors), so
    # a headline row would measure small-scale overhead, not the
    # scale shape. It is benched where the scale question lives: the
    # sf1 decade sweep (tools/bench_scaling.py SF1_QUERIES) — the
    # mirror of excluding the deliberately-quadratic exact audit from
    # that sweep.
    "dedup_containment_prefix",
]
# Comparability note: the four r9-wave seats were appended AFTER the
# committed r9 bench artifacts were generated (BENCH_SUMMARY.json /
# bench_history/r9.json cover 82 queries and don't include them), and
# the two r10 seats extend the list again — headline TOTALS are only
# comparable per-query (canary-normalized) across r9->r10.


SUMMARY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_SUMMARY.json"
)


def _write_summary(payload: dict) -> None:
    """Compact sidecar written incrementally after every timed query:
    the driver's stdout capture buffer is finite and BENCH_r05.json
    lost its head (headline + early per-query map unparseable), so the
    artifact of record lives in the repo and always parses, even if
    the process dies mid-run."""
    tmp = SUMMARY_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, separators=(",", ":"), sort_keys=True)
        f.write("\n")
    os.replace(tmp, SUMMARY_PATH)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def run_canary(spark) -> tuple[float, list[float]]:
    """Fixed machine-speed probe: a data-independent CPU fold over
    spark.range plus one 1M-row hash-agg shuffle. Its wall time
    normalizes round-over-round comparisons — this box swings 1.2-1.8x
    with co-tenant load (ROUND5_NOTES), so absolute walls from
    different rounds are only comparable as query_sec / canary_sec.
    r9: median-of-5 with every sample committed — the single-sample
    driver canary swung 0.54-1.45s between rounds on identical
    hardware, flipping normalized round-over-round conclusions by >2x
    (VERDICT r8 #5); the median bounds one co-tenant burst and the
    samples let a reader judge the spread."""

    def one() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).collect()
        (
            spark.range(1_000_000)
            .selectExpr("id % 9973 AS k", "id AS v")
            .groupBy("k")
            .sum("v")
            .count()
        )
        return time.perf_counter() - t0

    one()  # warm (JIT)
    samples = [round(one(), 3) for _ in range(5)]
    return round(_median(samples), 3), samples


def run_shuffle_canary(spark) -> tuple[float, list[float]]:
    """Fixed shuffle-I/O probe, the cpu canary's missing half: a
    two-Exchange repartition + hash-agg over 8M rows whose wall time
    is dominated by shuffle write/read, not compute. The r8 bench
    caught co-tenant DISK contention slowing shuffle-heavy queries
    20-70% while the cpu canary showed the box FASTER — the two
    canaries together separate "code got slower" from "which shared
    resource got slower". With spark.local.dir on tmpfs
    (session._scratch_dir) this probe should sit near its floor;
    a spike means the scratch override is off or memory-pressured.
    The agg result is COLLECTED (not count()'d) so the optimizer
    cannot prune the v payload below the repartition — with count()
    the probe shuffled only the 8M k values, half the width the
    docstring promises (r8 ADVICE)."""

    def one() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 8_000_000, 1, 32)
            .selectExpr("id % 65536 AS k", "id AS v")
            .repartition("k")
            .groupBy("k")
            .agg({"v": "sum"})
            .agg({"sum(v)": "sum"})
            .collect()
        )
        return time.perf_counter() - t0

    one()  # warm
    samples = [round(one(), 3) for _ in range(5)]
    return round(_median(samples), 3), samples


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bdt-bench")
    registry = all_queries()

    # warm the JVM + parquet footers with one cheap action so the first
    # timed query doesn't absorb session spin-up
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    canary_sec, canary_samples = run_canary(spark)
    shuffle_canary_sec, shuffle_canary_samples = run_shuffle_canary(spark)
    print(
        f"# canary: {canary_sec:.3f}s (samples {canary_samples})  "
        f"shuffle-canary: {shuffle_canary_sec:.3f}s "
        f"(samples {shuffle_canary_samples})",
        file=sys.stderr,
    )

    # steady-state methodology: three warm runs (JIT/codegen compile —
    # C2 needs several passes for wide generated methods, e.g. the
    # MinHash signature/banding pipeline), then the timed run.
    # Single-run numbers mix seconds of one-time JVM compilation into
    # sub-second queries.
    from big_data_tools_spark.operators.cache import (
        release_all_caches,
        release_caches,
    )

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    summary: dict = {
        "metric": "headline_total_wall_clock",
        "unit": "sec",
        "sf": float(sf) if sf else None,
        "canary_sec": canary_sec,
        "canary_samples": canary_samples,
        "shuffle_canary_sec": shuffle_canary_sec,
        "shuffle_canary_samples": shuffle_canary_samples,
        "queries": {},
        "queries_normalized": {},
        "queries_normalized_shuffle": {},
        "complete": False,
    }

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry[name]

        def run() -> int:
            # operators persist() intermediates per call; release after
            # each action so 4 back-to-back runs of every headline query
            # don't accumulate cached partitions in one executor heap
            df = spec.fn(spark, sf_dir)
            n = df.count()
            release_caches(df)
            # wrapper transforms can drop the per-frame cache tag;
            # sweep the session-global registry so nothing leaks into
            # the next timed run
            release_all_caches()
            return n

        for _ in range(2):
            run()  # warm (JIT/codegen)
        # best-of-3 timed: the round-2 "regressions" on
        # doc_quality_by_source / events_props_extract re-measured at
        # 1.0-1.14x of round 1 — best-of-2 still let one co-tenant
        # burst through; a third sample bounds that (ROUND3_NOTES.md)
        best, n = float("inf"), 0
        for _ in range(3):
            t0 = time.perf_counter()
            n = run()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
        summary["queries"][name] = timings[name]
        # canary-normalized units: the only number comparable across
        # rounds on this co-tenant-noisy box (VERDICT r8 #5)
        summary["queries_normalized"][name] = round(
            timings[name] / canary_sec, 3
        )
        # second normalization column (r11 VERDICT #2): shuffle-bound
        # seats track the shuffle canary, not the CPU canary — a
        # contended run (r11's 32c closing run spiked the shuffle
        # canary to ~2.1s late in the run) is self-labeled when the
        # two columns disagree. Additions-only: nothing existing is
        # renamed or removed.
        summary["queries_normalized_shuffle"][name] = round(
            timings[name] / shuffle_canary_sec, 3
        )
        summary["value"] = round(sum(timings.values()), 3)
        _write_summary(summary)

    # ---- skew stress fixture (r2 VERDICT ask #5): the salting in
    # operators/skew.py is recall-tested but was never BENCHED under
    # skew. One boilerplate hot band; salted vs unsalted wall-clock.
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.dedup import minhash_band_pairs
    from big_data_tools_spark.operators.skew import with_boilerplate_hotband

    skewed = with_boilerplate_hotband(
        load_table(spark, sf_dir, "documents"), every_n=10
    )

    def run_minhash(hot_threshold: int) -> float:
        def one() -> float:
            df = minhash_band_pairs(
                skewed, "text", "doc_id", hot_band_threshold=hot_threshold
            )
            t0 = time.perf_counter()
            df.count()
            dt = time.perf_counter() - t0
            release_caches(df)
            release_all_caches()
            return dt

        one()  # warm
        # best-of-3, same as the headline set: BENCH_r04's 1.19x
        # salted/unsalted ratio (vs 0.98-1.04x in quiet-box runs) was
        # a single co-tenant burst that best-of-2 couldn't bound
        return round(min(one(), one(), one()), 3)

    salted_sec = run_minhash(64)  # every boilerplate band is hot
    unsalted_sec = run_minhash(1 << 62)  # hot path never engages
    timings["dedup_minhash_pairs_skewed"] = salted_sec
    skew_check = {
        "salted_sec": salted_sec,
        "unsalted_sec": unsalted_sec,
        "ratio_salted_vs_unsalted": round(salted_sec / unsalted_sec, 3),
    }
    print(f"# skew_check: {skew_check}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "canary_sec": canary_sec,
        "canary_samples": canary_samples,
        "shuffle_canary_sec": shuffle_canary_sec,
        "shuffle_canary_samples": shuffle_canary_samples,
        "queries_normalized": {
            k: round(v / canary_sec, 3) for k, v in timings.items()
        },
        "queries_normalized_shuffle": {
            k: round(v / shuffle_canary_sec, 3) for k, v in timings.items()
        },
        "skew_check": skew_check,
    }
    summary.update(payload)
    summary["complete"] = True
    _write_summary(summary)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
