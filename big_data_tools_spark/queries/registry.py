"""Registry mapping query names to (Spark callable, DuckDB oracle SQL).

Contract (see ``__spark_entry__.py``): each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL runs on
DuckDB views named after the parquet tables. Column names must match
exactly between the two (the driver sorts columns by name and hashes
values), so every computed column is aliased identically on both sides.

Float policy: aggregate doubles are rounded to 2 decimals on BOTH sides
— Spark and DuckDB sum doubles in different orders, so unrounded sums
differ in final ulps; rounding collapses that while keeping the check
meaningful.
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
# enforces it against checked_rounds.json): round 5 drains the ten
# pending_r4 flagship twins (PageRank, triangles, bucketed join,
# leakage-safe split, incremental-ingest dedup, novelty, seasonality,
# Pareto, PSI, referential integrity) and re-rows the 40 twins whose
# last window was the lost-artifact r3 round. Everything past the
# window was driver-rowed in r1/r2/r4 and still runs against the same
# DuckDB oracle in tests/test_oracle_parity.py at every round.
_PRIORITY = [
    # -- round-5 window: the pending_r4 drain plus re-rows of the
    # twins whose only other driver rows predate the lost r3 artifact.
    # (tools/update_checked_rounds.py --plan computed the original
    # set under the 3-round cadence; after the mid-round move to
    # cadence 4, four slots whose occupants carry BOTH r1 and r2
    # surviving driver rows — custkey_overlap_setops,
    # customers_without_orders, fillna_policy, hours_parse — were
    # re-used for the four twins registered late in round 5, which
    # would otherwise overflow the pending queue — as were two more
    # (map_literal_parse, string_date_parse) for the prefix-Jaccard
    # and Welch twins registered in the same continuation. The
    # evicted six become cadence-mandatory again in r6; test_rotation
    # enforces the 4-round union invariant. Three further doubly-evidenced
    # slots — regional_revenue, segment_pivot, status_recode_operator
    # — were re-used to seat the first never-driver-windowed
    # rows-only representatives (r4 VERDICT ask #4):
    # streaming_corpus_ingest, ml_train_eval, multimodal_features.)
    "benchmark_contamination",
    "boilerplate_ngrams",
    "bucketed_revenue_join",  # pending_r4 drain
    "copurchase_triangles",  # pending_r4 drain
    "corpus_ngram_novelty",  # pending_r4 drain
    "customer_revenue_pareto",  # pending_r4 drain
    "customer_reorder_survival",  # registered round 5 (late)
    "customer_scd2_merge",
    "daily_revenue_acf",  # registered round 5 (late)
    "dedup_components",
    "dedup_embedding_cosine",
    "dedup_exact_docs",
    "dedup_incremental_ingest",  # pending_r4 drain
    "dedup_jaccard_pairs",
    "dedup_jaccard_prefix",  # registered round 5 (late)
    "dedup_winnow_pairs",
    "discount_quantity_ols",  # registered round 5 (late)
    "discount_quantity_spearman",  # registered round 5 (late)
    "doc_chunk_windows",
    "embedding_label_stats",
    "event_sessions_builtin",
    "event_type_hour_mutual_info",  # registered round 5 (late)
    "event_value_welch_ab",  # registered round 5 (late)
    "events_multires_rollup",
    "knn_cosine_brute",
    "leakage_safe_corpus_split",  # pending_r4 drain
    "ml_train_eval",  # rows-only seating (never driver-windowed)
    "monthly_forecast_accuracy",  # registered round 5 (late)
    "monthly_revenue_seasonality",  # pending_r4 drain
    "multimodal_features",  # rows-only seating (never driver-windowed)
    "daily_revenue_trend_robust",  # registered round 5 (late)
    "order_rollup_flagship",
    "orders_benford_digits",  # registered round 5 (late)
    "orders_price_psi",  # pending_r4 drain
    "part_copurchase_pagerank",  # pending_r4 drain
    "pretraining_corpus_pipeline",
    "purchase_click_window",
    "purchase_last_click_asof",
    "purchase_markov_attribution",  # registered round 5 (late)
    "purchase_shapley_attribution",  # registered round 5 (late)
    "referential_integrity_audit",  # pending_r4 drain
    "salted_status_rollup",
    "segment_revenue_bootstrap_ci",  # registered round 5 (late)
    "segment_revenue_gini",  # registered round 5 (late)
    "source_mixture_plan",
    "streaming_corpus_ingest",  # rows-only seating (never driver-windowed)
    "tfidf_top_terms",
    "token_shard_packing",
    "user_value_hourly_ffill",
    "waiting_supplier_lines",
    # ---- window boundary (50) ----
    # past-window: driver-rowed in r1/r2/r4, still oracle-checked
    # locally by tests/test_oracle_parity.py every round.
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
    "doc_winnow_stats",
    "documents_balanced_per_lang",
    "streaming_upsert_rollup",
    "streaming_dedup",
    "multimodal_features",
    "yelp_basetable_mini",
    "bm25_topk_docs",
    "doc_perplexity_by_source",
    "dedup_segments_reassembled",
    "dsir_target_selection",
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
    "hybrid_rrf_topk",
    "user_current_state_cdc",
    "dedup_span_coverage",
    "orders_custkey_skew",
    "events_user_heavy_hitters",
    "customer_kanonymity",
    "dedup_minhash_portable",
    "orders_snapshot_diff",
    "dedup_simhash_portable",
    "orders_pit_segment_revenue",
    "documents_weighted_sample",
    "streaming_segment_revenue",
    "doc_length_quantiles_approx",
    "dedup_minhash_pairs",
    "dedup_semantic_groups",
    "knn_lsh_ann",
    "ml_train_eval",
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
