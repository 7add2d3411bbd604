"""Registry mapping query names to (Spark callable, DuckDB oracle SQL).

Contract (see ``__spark_entry__.py``): each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL runs on
DuckDB views named after the parquet tables. Column names must match
exactly between the two (the driver sorts columns by name and hashes
values), so every computed column is aliased identically on both sides.

Float policy (rewritten r7 after the r6 driver hash failures proved
the old "rounding collapses ulp noise" claim wrong — a value within
one ulp of a rounding boundary rounds DIFFERENTLY per engine):

1. Quantize to integer/decimal BEFORE any cross-row reduction, never
   after. Money columns sum as DECIMAL/integer cents (functions/agg.py
   money_sum, or per-row cents BIGINTs); computed per-row doubles are
   round()-quantized per row and summed as DECIMAL. Decimal/integer
   addition is associative, so results are partition-order and engine
   independent. round(sum(raw double)) is BANNED.
2. No libm transcendental (ln/log/exp/pow) may touch a twinned
   surface: libm differs in the last ulp between engine builds, which
   flips quantization at boundaries. Use operators/portablemath.py
   (pln_sql/pexp_sql — pure IEEE arithmetic shared verbatim by both
   engines, bit-identical by construction) or restructure the twin to
   an integer domain. sqrt is exempt (IEEE-correctly-rounded).
3. Per-row double arithmetic (+ - * /) on engine-identical inputs is
   safe: IEEE requires correct rounding, and neither engine
   reassociates — keep the expression trees syntactically parallel.

plans/lint.py:lint_all_twins enforces 1-2 over every registered twin
(wired into tests/test_float_policy.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle twin; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]


# The driver's correctness gate checks the FIRST 50 entries of
# ``queries()``. The window ROTATES each round (tests/test_rotation.py
# enforces the 4-round union invariant against checked_rounds.json):
# round 6 seats the 32 cadence-mandatory twins (the 15 pending_r5 late
# registrations plus the re-row cohort, via
# `tools/update_checked_rounds.py --plan`), 13 of the lost-r3 twins
# that still lack ANY surviving committed driver row (r7 takes the
# rest so every twin regains one inside r04..r07), the new
# ml_features_split twin, and 4 never-driver-run rows-only seats
# (knn_ivf_ann, knn_pq_ann, ml_cv_select, streaming_rolling_dau).
# Everything past the window keeps its committed driver rows and is
# still oracle-checked locally by tests/test_oracle_parity.py.
_PRIORITY = [
    # -- round-6 window: 32 cadence-mandatory re-rows/pending drains
    "copurchase_adamic_adar",  # pending_r5 drain
    "copurchase_assortativity",  # pending_r5 drain
    "copurchase_kcore_peel",  # pending_r5 drain
    "corpus_heaps_fit",  # pending_r5 drain
    "corpus_zipf_fit",  # pending_r5 drain
    "custkey_overlap_setops",
    "customers_without_orders",
    "daily_revenue_cusum",  # pending_r5 drain
    "doc_bigram_backoff_nll",  # pending_r5 drain
    "doc_quality_auc",  # pending_r5 drain
    "doc_quality_by_source",
    "doc_repetition_by_source",
    "documents_stratified_portable",  # pending_r5 drain
    "event_entropy_rate",  # pending_r5 drain
    "event_funnel",
    "events_props_extract",
    "events_stickiness",  # pending_r5 drain
    "fillna_policy",
    "hours_parse",
    "lang_id_confusion",
    "lineitem_metric_unpivot",
    "lpa_convergence_trace",  # pending_r5 drain
    "map_literal_parse",
    "monthly_revenue_forecast",  # pending_r5 drain
    "null_audit_orders",
    "orders_incremental_quantile",  # pending_r5 drain
    "pagerank_convergence_trace",  # pending_r5 drain
    "part_like_filter",
    "regional_revenue",
    "segment_pivot",
    "status_recode_operator",
    "string_date_parse",
    # -- 13 lost-r3 twins with no surviving committed driver row yet
    "bm25_topk_docs",
    "dedup_minhash_portable",
    "dedup_segments_reassembled",
    "dedup_simhash_portable",
    "dedup_span_coverage",
    "doc_perplexity_by_source",
    "doc_winnow_stats",
    "dsir_target_selection",
    "events_user_heavy_hitters",
    "hybrid_rrf_topk",
    "orders_pit_segment_revenue",
    "user_current_state_cdc",
    "yelp_basetable_mini",
    # -- registered round 6: hash-level evidence for the ML basetable
    "ml_features_split",
    # -- rows-only seating (never driver-run before this round)
    "knn_ivf_ann",
    "knn_pq_ann",
    "ml_cv_select",
    "streaming_rolling_dau",
    # ---- window boundary (50) ----
    # past-window: driver-rowed in r1/r2/r4/r5, still oracle-checked
    # locally by tests/test_oracle_parity.py every round.
    "benchmark_contamination",
    "boilerplate_ngrams",
    "bucketed_revenue_join",
    "copurchase_triangles",
    "corpus_ngram_novelty",
    "customer_revenue_pareto",
    "customer_reorder_survival",
    "customer_scd2_merge",
    "daily_revenue_acf",
    "dedup_components",
    "dedup_embedding_cosine",
    "dedup_exact_docs",
    "dedup_incremental_ingest",
    "dedup_jaccard_pairs",
    "dedup_jaccard_prefix",
    "dedup_winnow_pairs",
    "discount_quantity_ols",
    "discount_quantity_spearman",
    "doc_chunk_windows",
    "embedding_label_stats",
    "event_sessions_builtin",
    "event_type_hour_mutual_info",
    "event_value_welch_ab",
    "events_multires_rollup",
    "knn_cosine_brute",
    "leakage_safe_corpus_split",
    "ml_train_eval",
    "monthly_forecast_accuracy",
    "monthly_revenue_seasonality",
    "multimodal_features",
    "daily_revenue_trend_robust",
    "order_rollup_flagship",
    "orders_benford_digits",
    "orders_price_psi",
    "part_copurchase_pagerank",
    "pretraining_corpus_pipeline",
    "purchase_click_window",
    "purchase_last_click_asof",
    "purchase_markov_attribution",
    "purchase_shapley_attribution",
    "referential_integrity_audit",
    "salted_status_rollup",
    "segment_revenue_bootstrap_ci",
    "segment_revenue_gini",
    "source_mixture_plan",
    "streaming_corpus_ingest",
    "tfidf_top_terms",
    "token_shard_packing",
    "user_value_hourly_ffill",
    "waiting_supplier_lines",
    "customer_rfm_segments",
    "documents_temperature_mixture",
    "event_transition_matrix",
    "events_daily_completeness",
    "lang_source_chi2",
    "part_basket_lift",
    "purchase_decay_attribution",
    "signup_retention_cohorts",
    "user_value_anomalies",
    "pricing_summary",
    "priority_recode",
    "sentinel_audit_orders",
    "distinct_status_priority",
    "distinct_customer_count",
    "dedup_orders_keep_first",
    "nation_customer_value",
    "topk_orders_per_customer",
    "top100_orders",
    "priority_union",
    "monthly_revenue",
    "customers_with_urgent_orders",
    "revenue_rollup",
    "event_sessions",
    "orders_above_customer_avg",
    "status_priority_cube",
    "user_value_sliding_1h",
    "customer_spend_deciles",
    "customer_order_coverage",
    "embedding_centroids",
    "frequent_big_spenders",
    "doc_length_quantiles",
    "event_value_stats",
    "segment_revenue_share",
    "returnflag_price_corr",
    "status_priority_mode",
    "discount_band_histogram",
    "bulk_rename",
    "events_hourly",
    "part_name_tokens",
    "doc_token_stats",
    "doc_fingerprints",
    "doc_bpe_token_estimate",
    "events_rolling_dau",
    "orders_incremental_rollup",
    "gdpr_erasure_cascade",
    "dedup_canonical_docs",
    "dedup_cluster_size_spectrum",
    "source_overlap_matrix",
    "vocab_oov_rate",
    "token_skipgram_counts",
    "small_qty_part_revenue",
    "top_volume_orders",
    "top_revenue_supplier",
    "supplier_value_concentration",
    "idle_rich_customers",
    "nation_trade_balance_sql",
    "late_ship_priority_counts",
    "promo_revenue_multibrand",
    "nation_market_share",
    "pii_scrub_audit",
    "embedding_int8_audit",
    "knn_cosine_int8",
    "dedup_fuzzy_part_names",
    "corpus_vocabulary",
    "embedding_hard_negatives",
    "orders_quality_gate",
    "events_props_variant",
    "documents_balanced_per_lang",
    "streaming_upsert_rollup",
    "streaming_dedup",
    "orders_profile",
    "corpus_shuffle_shards",
    "regional_min_price_suppliers",
    "segment_top_open_orders",
    "narrow_discount_revenue",
    "nation_product_profit",
    "returned_item_customers",
    "late_line_priority_split",
    "customer_order_count_distribution",
    "promo_revenue_share",
    "part_attr_supplier_counts",
    "dominant_part_suppliers",
    "orders_custkey_skew",
    "customer_kanonymity",
    "orders_snapshot_diff",
    "documents_weighted_sample",
    "streaming_segment_revenue",
    "doc_length_quantiles_approx",
    "dedup_minhash_pairs",
    "dedup_semantic_groups",
    "knn_lsh_ann",
    "ml_feature_importance",
    "streaming_hourly_counts",
    "streaming_sessions",
    "streaming_attribution",
    "yelp_basetable",
]


def ordered_queries() -> dict[str, QuerySpec]:
    """Registry in driver-check order: ``_PRIORITY`` first, then the
    remaining entries in registration order."""
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    out = {n: _REGISTRY[n] for n in _PRIORITY}
    out.update((n, s) for n, s in _REGISTRY.items() if n not in out)
    return out
