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
# enforces it against checked_rounds.json): round 4 drains the nine
# pending_r3 analytics twins, re-rows the 33 r1-era twins that would
# otherwise fall out of the 3-round union (their last driver row was
# round 1), and seats the 8 new round-4 twins. Everything past the
# window was driver-green in r1-r3 and still runs against the same
# DuckDB oracle in tests/test_oracle_parity.py at every round.
_PRIORITY = [
    # -- pending_r3 drain: 3e analytics twins (test_rotation enforces) --
    "customer_rfm_segments",
    "documents_temperature_mixture",
    "event_transition_matrix",
    "events_daily_completeness",
    "lang_source_chi2",
    "part_basket_lift",
    "purchase_decay_attribution",
    "signup_retention_cohorts",
    "user_value_anomalies",
  # -- r1-era twins at the 3-round union limit (must re-row in r4) --
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
  # -- round-4 additions --
    "events_rolling_dau",  # exact sliding 7-day distinct users, bounded fan-out
    "orders_incremental_rollup",  # mergeable-state rollup maintenance
    "gdpr_erasure_cascade",  # right-to-erasure cascade audit
    "dedup_canonical_docs",  # survivor selection -> deduped corpus manifest
    "dedup_cluster_size_spectrum",  # duplication spectrum report
    "source_overlap_matrix",  # cross-source duplicate overlap
    "vocab_oov_rate",  # top-V vocabulary OOV audit
    "token_skipgram_counts",  # zero-join skip-gram co-occurrence
    # ---- window boundary (50) ----
    # (bucketed_revenue_join rides pending_r4: the 50 slots are
    # saturated by the pending_r3 drain + the 33 r1-era twins
    # hitting the 3-round union limit + 8 round-4 twins.)
    "bucketed_revenue_join",  # zero-exchange bucketed layout join (pending r5 window)
    # past-window: driver-green in r1-r3, still oracle-checked locally
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
    "event_sessions_builtin",
    "streaming_segment_revenue",
    "order_rollup_flagship",
    "customer_scd2_merge",
    "dedup_components",
    "purchase_last_click_asof",
    "tfidf_top_terms",
    "dedup_jaccard_pairs",
    "pretraining_corpus_pipeline",
    "benchmark_contamination",
    "doc_chunk_windows",
    "purchase_click_window",
    "events_multires_rollup",
    "token_shard_packing",
    "part_like_filter",
    "null_audit_orders",
    "segment_pivot",
    "custkey_overlap_setops",
    "status_recode_operator",
    "string_date_parse",
    "events_props_extract",
    "lineitem_metric_unpivot",
    "fillna_policy",
    "hours_parse",
    "map_literal_parse",
    "salted_status_rollup",
    "event_funnel",
    "user_value_hourly_ffill",
    "dedup_exact_docs",
    "dedup_embedding_cosine",
    "dedup_winnow_pairs",
    "boilerplate_ngrams",
    "waiting_supplier_lines",
    "embedding_label_stats",
    "knn_cosine_brute",
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
    "doc_quality_by_source",
    "lang_id_confusion",
    "regional_revenue",
    "customers_without_orders",
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
