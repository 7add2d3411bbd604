"""Cache lifecycle: operators persist() intermediates; the harness
sweep must leave ZERO persisted RDDs behind, including when a query's
wrapper transformations dropped the per-frame tag (the bug class fixed
by cache.release_all_caches)."""

from __future__ import annotations

from big_data_tools_spark.operators.cache import release_all_caches, release_caches
from big_data_tools_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

# queries whose operators persist intermediates, each with a wrapper
# (.select/.groupBy/.orderBy) between the tagged frame and the result
CACHING_QUERIES = [
    "dedup_minhash_pairs",
    "dedup_components",
    "purchase_click_window",
    "dsir_target_selection",
    "bpe_corpus_stats",
]


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_release_all_caches_sweeps_wrapper_dropped_tags(spark):
    release_all_caches()  # start from a clean slate
    reg = all_queries()
    for name in CACHING_QUERIES:
        df = reg[name].fn(spark, SF)
        df.count()
        release_caches(df)
        release_all_caches()
        assert _n_persisted(spark) == 0, f"{name} leaked persisted RDDs"


def test_release_all_caches_clears_gcd_cache_manager_entries(spark):
    """The r9 full-suite failure class: a persisted frame whose Python
    handle is GC'd leaves the WeakSet, so release_all_caches never
    calls df.unpersist() on it; the RDD-blocks sweep frees storage but
    NOT the JVM CacheManager entry, and any later plan containing the
    same fragment silently substitutes an InMemoryRelation whose
    cached stats can flip a join to BroadcastNestedLoopJoin
    (test_containment_no_cartesian flipped with test order). The fixed
    sweep calls spark.catalog.clearCache(), emptying the CacheManager
    so downstream plans only contain their OWN persists."""
    import gc
    import re

    from pyspark.sql import functions as F

    release_all_caches()
    doc = spark.read.parquet(f"{SF}/documents.parquet")
    # persist a fragment the containment pipeline also builds
    # (lowered text scan), then lose every Python handle to it
    leaked = doc.select("doc_id", F.lower("text").alias("text_l"))
    leaked.persist()
    leaked.count()
    del leaked
    gc.collect()

    release_all_caches()

    # mechanism: the sweep must empty the JVM CacheManager, not just
    # free RDD blocks — a stale entry re-caches on the next plan match
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()

    # symptom: the containment plan keeps its pinned shape (its own
    # persists show as InMemoryRelation — that is expected; a SECOND
    # BroadcastNestedLoopJoin from cached-entry stats is the bug)
    df = all_queries()["dedup_containment_pairs"].fn(spark, SF)
    try:
        from big_data_tools_spark.plans.lint import explain_text

        txt = explain_text(df, "formatted")
        nodes = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", txt, re.M)
        assert len(nodes) <= 1, txt[:2000]
    finally:
        release_caches(df)
        release_all_caches()
