#!/usr/bin/env python
"""Isolated re-run of bench.py's salted-vs-unsalted skew probe.

The in-bench probe (dedup_minhash_pairs_skewed + skew_check block)
runs late in an 80-query JVM; its salted/unsalted ratio read 1.399 in
the r10 builder run vs 1.124 (r9) and 1.198 (driver r10) — spread the
r10 verdict asked to re-measure in isolation ("what's wrong" #5).
This replays the exact fixture (boilerplate hot band every 10 docs,
minhash band pairs with/without the hot-band salting) in ONE fresh
process with the bench canary, and prints one JSON line for the
``isolated`` block of bench_history/r{N}.json.

Run: python tools/bench_skew_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import run_canary
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.cache import (
        release_all_caches,
        release_caches,
    )
    from big_data_tools_spark.operators.dedup import minhash_band_pairs
    from big_data_tools_spark.operators.skew import with_boilerplate_hotband
    from big_data_tools_spark.session import get_spark

    spark = get_spark(app_name="bdt-skew-probe")
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    canary_sec, _ = run_canary(spark)
    skewed = with_boilerplate_hotband(
        load_table(spark, SF_DIR, "documents"), every_n=10
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
        return round(min(one(), one(), one()), 3)

    salted = run_minhash(64)
    unsalted = run_minhash(1 << 62)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "canary_sec": round(canary_sec, 3),
                "salted_sec": salted,
                "unsalted_sec": unsalted,
                "ratio_salted_vs_unsalted": round(salted / unsalted, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
