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
# ``queries()`` (round 1 checked exactly registry positions 0-49, so
# positions 50+ never got a driver row). This ordering guarantees the
# checked window covers every SURVEY.md §2 family and every §2.11
# operator: first the oracle twins that went unchecked in round 1, then
# the rows-only operator surfaces (ML/streaming/LSH/yelp), then one
# representative per remaining §2 family. Entries past the window are
# near-duplicate demonstrations of families already covered inside it
# (all still run in tests/test_oracle_parity.py at every round).
_PRIORITY = [
    # round-1 unchecked oracle twins (VERDICT.md "What's missing" #1)
    "purchase_last_click_asof",   # as-of join
    "purchase_click_window",      # range join
    "salted_status_rollup",       # skew-salted two-phase agg
    "event_funnel",               # sequential window funnel
    "events_multires_rollup",     # grouping sets multi-resolution
    "tfidf_top_terms",            # widest text plan (7 shuffles)
    "user_value_hourly_ffill",    # resample + last(ignorenulls) ffill
    "dedup_exact_docs",
    "dedup_jaccard_pairs",
    "dedup_components",           # connected components fixpoint
    "dedup_embedding_cosine",
    "dedup_winnow_pairs",         # winnowing fingerprint tier (round 2)
    "pretraining_corpus_pipeline",  # composed capstone (round 2)
    "benchmark_contamination",    # train-vs-eval n-gram overlap (round 2)
    "token_shard_packing",        # bucketed token-budget pack (round 2)
    "boilerplate_ngrams",         # heavy-hitter shingle report (round 2)
    "doc_repetition_by_source",   # Gopher repetition filter (round 2)
    "source_mixture_plan",        # domain-mixture rebalance (round 2)
    "customer_scd2_merge",        # SCD-2 dimension merge (round 2)
    "waiting_supplier_lines",     # Q21 shape: 1-shuffle window rewrite (round 2)
    "event_sessions_builtin",     # native session_window aggregation (round 2)
    "doc_chunk_windows",          # stride-window chunking (round 2)
    "embedding_label_stats",
    "knn_cosine_brute",
    # fixed result shape this round — needs its driver row back
    "doc_length_quantiles_approx",
    # rows-only operator surfaces (weaker check, but must have a row)
    "dedup_minhash_pairs",
    "dedup_semantic_groups",      # SemDeDup (round 2)
    "knn_lsh_ann",
    "ml_train_eval",
    "ml_feature_importance",
    "streaming_hourly_counts",
    "streaming_sessions",
    "streaming_attribution",      # stream-stream interval join (round 2)
    "yelp_basetable",
    # one representative per remaining §2 family (all green in round 1).
    # Conditional-count agg rides order_rollup_flagship (A1), two-level
    # aggregation rides waiting_supplier_lines, rank windows ride
    # customer_spend_deciles locally — their dedicated demos moved past
    # the window to make room for the round-2 shapes above.
    "order_rollup_flagship",      # star join + distributed scalar + datediff
    "regional_revenue",           # broadcast dim joins
    "part_like_filter",           # LIKE disjunction
    "null_audit_orders",          # null predicates + isnan
    "segment_pivot",              # pivot with declared values
    "custkey_overlap_setops",     # intersect/except
    "status_recode_operator",     # fold-left recode, batched withColumns
    "customers_without_orders",   # anti join
    "lineitem_metric_unpivot",    # unpivot/stack
    "string_date_parse",          # to_timestamp both patterns + ltrim
    "fillna_policy",              # const + computed fill
    "hours_parse",                # split/substring_index/concat hours
    "map_literal_parse",          # translate + create_map + map explode
    "events_props_extract",       # semi-structured JSON extraction
    "doc_quality_by_source",      # quality scoring
    "lang_id_confusion",          # language-ID
    # past-window: family near-duplicates (in-window coverage noted)
    "doc_token_stats",            # token counting (inside corpus pipeline's oracle)
    "distinct_customer_count",    # distinct count (rides setops row counts)
    "pricing_summary",            # grouped multi-agg + conditional counts
    "nation_customer_value",      # two-level aggregation
    "topk_orders_per_customer",   # row_number window
    "dedup_orders_keep_first",    # deterministic dedup
    "customers_with_urgent_orders",  # semi join
    "revenue_rollup",             # rollup
    "distinct_status_priority",   # distinct values
    "top100_orders",              # TakeOrderedAndProject
    "priority_union",             # union + inequality filter
    "event_sessions",             # lag-based sessionization window
    "bulk_rename",                # bulk + driver-side rename
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
