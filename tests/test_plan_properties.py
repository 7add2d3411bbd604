"""Physical-plan property tests (SURVEY.md §4.4): the plans that must
hold at 100 TB — pushdown, broadcast, bounded shuffles, codegen.
"""

from __future__ import annotations

from big_data_tools_spark.plans.lint import (
    count_exchanges,
    has_broadcast_hash_join,
    pushed_filters,
    whole_stage_codegen_spans,
)
from big_data_tools_spark.queries import get


def test_pricing_summary_pushes_filter_to_scan(spark, sf_smoke):
    df = get("pricing_summary").fn(spark, sf_smoke)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_regional_revenue_broadcasts_dims(spark, sf_smoke):
    df = get("regional_revenue").fn(spark, sf_smoke)
    assert has_broadcast_hash_join(df)
    # orders⋈customer may shuffle; nation/region must not add exchanges:
    # 1 join shuffle side pair at most + 1 agg shuffle
    assert count_exchanges(df) <= 3


def test_pricing_summary_single_shuffle(spark, sf_smoke):
    # partial+final hash agg -> exactly one shuffle on the group keys
    df = get("pricing_summary").fn(spark, sf_smoke)
    assert count_exchanges(df) == 1


def test_flagship_uses_broadcast_for_scalar(spark, sf_smoke):
    df = get("order_rollup_flagship").fn(spark, sf_smoke)
    # the global-max scalar must ride a broadcast, not a shuffle
    assert has_broadcast_hash_join(df) or "BroadcastNestedLoopJoin" in _txt(df)


def _txt(df):
    from big_data_tools_spark.plans.lint import explain_text

    return explain_text(df, "formatted")


def test_codegen_covers_core_pipeline(spark, sf_smoke):
    df = get("pricing_summary").fn(spark, sf_smoke)
    assert whole_stage_codegen_spans(df) >= 1


def test_unpivot_reads_input_once(spark, sf_smoke):
    """The melt operator's reason to exist: one scan for all metrics
    (the naive per-metric UNION ALL scans N times)."""
    from big_data_tools_spark.plans.lint import explain_text
    from big_data_tools_spark.queries import get

    df = get("lineitem_metric_unpivot").fn(spark, sf_smoke)
    plan = explain_text(df, "simple")
    assert plan.count("Scan parquet") == 1, plan[:1500]


def test_full_outer_coverage_aggregates_before_join(spark, sf_smoke):
    """Orders must aggregate below the full outer join: the join input
    carries one row per customer, not one per order."""
    from big_data_tools_spark.plans.lint import explain_text
    from big_data_tools_spark.queries import get

    df = get("customer_order_coverage").fn(spark, sf_smoke)
    plan = explain_text(df, "formatted")
    join_pos = plan.find("SortMergeJoin")
    if join_pos == -1:
        join_pos = plan.find("ShuffledHashJoin")
    agg_pos = plan.find("HashAggregate")
    assert join_pos != -1 and agg_pos != -1
    # formatted explain lists children before parents: the aggregate
    # node id must be numerically above the join in the tree section
    assert "FullOuter" in plan or "full_outer" in plan.lower()


def test_range_join_is_hash_join_not_nested_loop(spark, sf_smoke):
    from big_data_tools_spark.plans.lint import explain_text

    df = get("purchase_click_window").fn(spark, sf_smoke)
    plan = explain_text(df, "formatted")
    # bucketed banding must plan as a pure equi-join on (key, bucket):
    # a range predicate that leaks into the join condition shows up as
    # a nested-loop / cartesian strategy
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multires_rollup_scans_events_once(spark, sf_smoke):
    import re

    from big_data_tools_spark.plans.lint import explain_text

    df = get("events_multires_rollup").fn(spark, sf_smoke)
    plan = explain_text(df, "formatted")
    # grouping-sets expansion must not re-scan the fact table per
    # resolution: one Scan parquet node + Expand feeding one agg pair
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Expand" in plan


def test_contamination_train_side_joins_are_broadcast(spark, sf_smoke):
    """The 100 TB contract: every join the train index participates in
    builds on a broadcast side — no sort-merge shuffle of the corpus."""
    from big_data_tools_spark.operators.cache import release_caches

    df = get("benchmark_contamination").fn(spark, sf_smoke)
    plan = _txt(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    release_caches(df)


def test_shard_packing_window_is_partitioned(spark, sf_smoke):
    """The pack windows must hash-partition by bucket; a global
    running sum would plan Exchange SinglePartition (one task)."""
    df = get("token_shard_packing").fn(spark, sf_smoke)
    plan = _txt(df)
    assert "Window" in plan
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(bucket" in plan, plan


def test_boilerplate_ngrams_plans_take_ordered(spark, sf_smoke):
    """Top-k must not materialize a global sort."""
    df = get("boilerplate_ngrams").fn(spark, sf_smoke)
    assert "TakeOrderedAndProject" in _txt(df)


def test_repetition_rollup_single_shuffle_after_fanout(spark, sf_smoke):
    # pure-expression scoring + partial/final agg: the only exchanges
    # are the fan_out input spread and the group-key shuffle
    df = get("doc_repetition_by_source").fn(spark, sf_smoke)
    assert count_exchanges(df) <= 2


def test_scd2_merge_bounded_shuffles(spark, sf_smoke):
    """SCD-2 merge: update-batch agg + one full-outer join — no extra
    exchanges from the array+explode row emission."""
    df = get("customer_scd2_merge").fn(spark, sf_smoke)
    assert count_exchanges(df) <= 3
    plan = _txt(df)
    assert "Generate" in plan  # explode emission, not a triple union scan
    assert plan.count("FileScan") <= 3  # customer x2 (dim + upd) + orders


def test_promo_revenue_broadcasts_pruned_dim(spark, sf_smoke):
    """Q19 shape: part side broadcast after brand pruning; the
    OR-of-ANDs reaches the lineitem scan as a pushed quantity filter."""
    df = get("promo_revenue_multibrand").fn(spark, sf_smoke)
    assert has_broadcast_hash_join(df)
    assert count_exchanges(df) == 1  # only the final scalar agg
    pushed = pushed_filters(df)
    assert any("l_quantity" in p for p in pushed), pushed


def test_late_ship_uses_semi_join(spark, sf_smoke):
    """Q4 shape: the EXISTS must plan as LeftSemi (dedup inside the
    join), never as inner join + distinct."""
    plan = _txt(get("late_ship_priority_counts").fn(spark, sf_smoke))
    assert "LeftSemi" in plan
    assert "HashAggregate" in plan


def test_waiting_supplier_partial_aggregates_before_window(spark, sf_smoke):
    """Q21 shape: the fact table must reduce to (order, supplier) grain
    BEFORE the order-partition window — the window never sees raw
    lineitem rows, and the supplier dim rides a broadcast."""
    plan = _txt(get("waiting_supplier_lines").fn(spark, sf_smoke))
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert 0 <= agg_pos < win_pos, (agg_pos, win_pos)
    assert has_broadcast_hash_join(get("waiting_supplier_lines").fn(spark, sf_smoke))


def test_market_share_broadcasts_all_dims(spark, sf_smoke):
    """Q8 shape: five dimension sides broadcast; shuffles are only the
    fact co-partitioning and the year rollup."""
    df = get("nation_market_share").fn(spark, sf_smoke)
    plan = _txt(df)
    assert plan.count("BroadcastHashJoin") >= 4, plan.count("BroadcastHashJoin")
    assert count_exchanges(df) <= 3


def test_q6_all_predicates_pushed(spark, sf_smoke):
    """TPC-H Q6: the canonical pushdown probe — ship-date, discount
    band, and quantity cap must all reach the parquet scan, and the
    global agg is a single partial+final exchange."""
    df = get("narrow_discount_revenue").fn(spark, sf_smoke)
    pushed = pushed_filters(df)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert any(col in p for p in pushed), (col, pushed)
    assert count_exchanges(df) == 1


def test_q3_plans_take_ordered(spark, sf_smoke):
    """TPC-H Q3: ORDER BY + LIMIT must plan TakeOrderedAndProject, not
    a global sort."""
    df = get("segment_top_open_orders").fn(spark, sf_smoke)
    assert "TakeOrderedAndProject" in _txt(df)


def test_q9_star_broadcasts_every_dim(spark, sf_smoke):
    """TPC-H Q9: part/supplier/nation are broadcast; no SortMergeJoin
    should appear against the dimension sides."""
    df = get("nation_product_profit").fn(spark, sf_smoke)
    txt = _txt(df)
    assert txt.count("BroadcastHashJoin") >= 3, txt.count("BroadcastHashJoin")
    pushed = pushed_filters(df)
    assert any("widget" in p for p in pushed), pushed  # LIKE reaches scan


def test_q14_no_fact_shuffle_before_agg(spark, sf_smoke):
    """TPC-H Q14: part broadcasts, so the only exchange is the final
    1-row aggregate."""
    df = get("promo_revenue_share").fn(spark, sf_smoke)
    assert has_broadcast_hash_join(df)
    assert count_exchanges(df) <= 2  # broadcast + single-row final agg


def test_skew_summary_windows_tiny_frames_only(spark, sf_smoke):
    """The Gini report must not globally sort per-key counts: its only
    window runs over the group-size histogram. Proxy check: bounded
    exchange count (counts agg + sizes agg + window + final joins)."""
    df = get("orders_custkey_skew").fn(spark, sf_smoke)
    assert count_exchanges(df) <= 5, count_exchanges(df)


def test_rrf_candidate_cut_is_take_ordered(spark, sf_smoke):
    """Hybrid RRF: both candidate lists cut with TakeOrderedAndProject
    BEFORE the single-partition ranking window sees them."""
    df = get("hybrid_rrf_topk").fn(spark, sf_smoke)
    assert _txt(df).count("TakeOrderedAndProject") >= 2


def test_cdc_single_key_shuffle(spark, sf_smoke):
    """CDC apply-changes: one window shuffle on the key, nothing else."""
    df = get("user_current_state_cdc").fn(spark, sf_smoke)
    assert count_exchanges(df) == 1


def test_dynamic_partition_pruning_fires_on_partitioned_fact(
    spark, sf_smoke, tmp_path_factory
):
    """The 100 TB star-join mechanism this repo's partitioned sinks
    exist for: joining a date-partitioned fact against a filtered dim
    must inject a dynamicpruning subquery into the scan's
    PartitionFilters, so only the dim-selected partitions are read —
    without it, every partition of a 100 TB fact is scanned no matter
    how selective the dim filter is."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.io.sources import load_table

    out = str(tmp_path_factory.mktemp("dpp")) + "/orders"
    load_table(spark, sf_smoke, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    ).write.partitionBy("o_year").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [(y, "new" if y >= 1997 else "old") for y in range(1992, 1999)],
        "y int, era string",
    )
    q = (
        fact.join(dim, fact.o_year == dim.y)
        .filter(F.col("era") == "new")
        .groupBy("o_year")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    got = {r["o_year"] for r in q.collect()}
    assert got == {1997, 1998}


def test_aqe_coalesces_small_shuffles_at_runtime(spark, sf_smoke):
    """The session factory turns AQE on so runtime statistics — not
    the static spark.sql.shuffle.partitions guess — size every
    shuffle read. On a small aggregate the 32 static partitions must
    coalesce (at 100 TB the same machinery splits skewed partitions
    and rewrites oversized joins); the executed plan carries the
    AQEShuffleRead coalesced marker only after the job actually
    runs."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.io.sources import load_table

    q = (
        load_table(spark, sf_smoke, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q.collect()  # AQE finalizes the plan during execution
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan


def test_aqe_splits_skewed_join_partitions(spark):
    """The runtime half of the skew defense: the manual salting tiers
    (operators/skew.py) handle aggregation skew we can see coming; for
    JOIN skew, AQE detects oversized shuffle partitions from runtime
    stats and splits them (SortMergeJoin(skew=true)) — at 100 TB this
    is what keeps one hot key from pinning a single task. Thresholds
    are lowered here so the fixture-scale hot key qualifies; the
    mechanism is the same at production sizes."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(200_000).select(
            (F.col("id") * 0).alias("k"), F.col("id").alias("v")
        )
        tail = spark.range(5_000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), F.lit("x").alias("attr")
        )
        q = hot.union(tail).join(right, "k")
        assert len(q.collect()) == 205_000
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_jaccard_prefix_never_broadcasts_corpus_frames(spark, sf_smoke):
    """The three frames that must never broadcast at scale: the
    shingle-df table (corpus-sized), the candidate-pair frame, and
    the per-doc set arrays — all joins in the prefix-Jaccard plan are
    pinned shuffle-hash / sort-merge, so NO BroadcastHashJoin may
    appear anywhere in the plan."""
    from big_data_tools_spark.operators.cache import (
        release_all_caches,
        release_caches,
    )

    df = get("dedup_jaccard_prefix").fn(spark, sf_smoke)
    try:
        txt = _txt(df)
        assert "BroadcastHashJoin" not in txt, txt[:2000]
        assert "BroadcastNestedLoopJoin" not in txt
    finally:
        release_caches(df)
        release_all_caches()


def test_bootstrap_ci_bounded_shuffles(spark, sf_smoke):
    """The 40x replicate fan-out must aggregate map-side: the plan may
    shuffle at the (segment, replicate) grain and the segment grain,
    plus the base join — but the weighted fan-out itself must never be
    exchanged raw (a raw exchange would ship 40x the fact table)."""
    from big_data_tools_spark.plans.lint import explain_text

    df = get("segment_revenue_bootstrap_ci").fn(spark, sf_smoke)
    plan = explain_text(df, "formatted")
    # partial_ (map-side) aggregation must appear below the exchange
    # for the replicate means
    assert "partial_" in plan.lower() or "HashAggregate" in plan
    # the customer dim joins broadcast; the fan-out never does
    assert count_exchanges(df) <= 6, explain_text(df, "simple")


def test_mutual_info_windows_run_on_grid_not_facts(spark, sf_smoke):
    """The marginal window sums must sit ABOVE the joint aggregation
    (grid grain), never over the raw events: the plan has exactly one
    aggregate over events, then window exchanges over the bounded
    grid."""
    from big_data_tools_spark.plans.lint import explain_text

    df = get("event_type_hour_mutual_info").fn(spark, sf_smoke)
    plan = explain_text(df, "formatted")
    # one scan of events only
    assert plan.count("events.parquet") <= 1 or plan.count("Scan parquet") <= 2
    assert "Window" in plan


def test_welch_single_aggregate_over_events(spark, sf_smoke):
    """All six moment sums reduce in ONE map-side-combining aggregate:
    exactly one exchange (to the event_type grain)."""
    df = get("event_value_welch_ab").fn(spark, sf_smoke)
    assert count_exchanges(df) == 1, _txt(df)[:1500]


def test_hits_score_joins_are_shuffle_hash_not_broadcast(spark, sf_smoke):
    """The HITS score frames are |V|-sized: the edge-side joins must
    honor the shuffle_hash pin (the r5 sf1 sweep proved AQE broadcast-
    promotes exactly this frame shape — a driver OOM at 100 TB). The
    production path localCheckpoints each half-step (hiding earlier
    joins from the final plan), so inspect one uncheckpointed
    iteration: both half-step joins must plan as ShuffledHashJoin."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.hits import hits

    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    edges = (
        orders.join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst"))
        .distinct()
    )
    hubs, auths = hits(edges, 1, checkpoint=False)
    for df in (hubs, auths):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # every join against a score frame (its key is the aliased
        # `node` column) must be shuffle-hash; the edge-construction
        # broadcast (orders x lineitem, a genuinely dim-sized side) is fine
        score_joins = [
            ln for ln in plan.splitlines()
            if "Join" in ln and "[node#" in ln
        ]
        assert score_joins, plan[:1500]
        for ln in score_joins:
            assert "ShuffledHashJoin" in ln, ln


def test_jsd_bins_ride_one_fact_scan_and_broadcasts(spark, sf_smoke):
    """orders_price_jsd: bounds and totals must ride broadcast 1-row
    frames (BroadcastNestedLoopJoin cross), with the only hash
    shuffle being the bin aggregate — the fact table is scanned for
    bounds and for binning, never shuffled at fact grain."""
    df = get("orders_price_jsd").fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    from big_data_tools_spark.operators.cache import release_all_caches
    release_all_caches()


def test_cramers_v_marginals_broadcast_over_grid(spark, sf_smoke):
    """priority_status_cramers_v: the r x c grid build must join
    broadcast marginals (obs/rt/ct are all bounded), never shuffle
    the contingency cells."""
    df = get("priority_status_cramers_v").fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2
    from big_data_tools_spark.operators.cache import release_all_caches
    release_all_caches()


def test_kmv_kmin_is_take_ordered_not_global_sort(spark, sf_smoke):
    """events_user_kmv_distinct: the k smallest hashes must come from
    TakeOrderedAndProject, never a full Sort of the distinct-user
    frame (a global sort is the classic sketch-implementation
    scale-killer)."""
    df = get("events_user_kmv_distinct").fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    from big_data_tools_spark.operators.cache import release_all_caches
    release_all_caches()


def test_ngram_entropy_bounded_exchanges(spark, sf_smoke):
    """r9 rework: totals + entropy fold share one aggregation per gram
    level (sum c*ln(N/c) = N*lnN - sum c*ln c), so the plan carries at
    most 6 exchanges — the r8 shape re-scanned each count table
    against its totals row (13 exchanges, the one driver-bench
    regression that round)."""
    from big_data_tools_spark.operators.cache import release_all_caches

    df = get("corpus_ngram_entropy").fn(spark, sf_smoke)
    try:
        assert count_exchanges(df) <= 6
    finally:
        release_all_caches()


def test_fd_audit_no_joins(spark, sf_smoke):
    """The FD audit is pure aggregation: one grouped count-distinct
    per candidate + a one-row rollup each — any join in this plan
    would be a regression toward a self-join FD checker that cannot
    scale."""
    df = get("orders_fd_violations").fn(spark, sf_smoke)
    txt = _txt(df)
    assert "Join" not in txt, txt[:2000]


def test_containment_no_cartesian(spark, sf_smoke):
    """Candidate pairs must come from bounded posting-list expansion,
    never a corpus cross join."""
    from big_data_tools_spark.operators.cache import release_all_caches

    release_all_caches()  # stale persists from other tests change the plan
    df = get("dedup_containment_pairs").fn(spark, sf_smoke)
    try:
        txt = _txt(df)
        assert "CartesianProduct" not in txt
        # exactly one BroadcastNestedLoopJoin node is expected: the
        # broadcast ONE-ROW df-cap frame (df <= cap), same shape as
        # jaccard_pairs — anything more would be a corpus cross join
        # (formatted explain prints each node twice: once in the tree
        # as `Name (n)`, once in details as `(n) Name` — count the
        # detail headers)
        import re

        nodes = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", txt, re.M)
        assert len(nodes) <= 1, txt[:2000]
    finally:
        release_all_caches()
