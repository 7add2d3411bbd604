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
