"""Isolated re-measurement of bench watch-list queries.

The per-round bench (bench.py) runs 80+ queries back-to-back in one
JVM; a handful of sub-second shuffle-heavy queries read 1.4-2.2x
round-over-round swings there that isolated re-runs don't reproduce
(r9 verdict "what's wrong" #4: contention calls were narrated, not
committed). This tool re-times the named queries EXACTLY the way
bench.py does (2 warm runs, best-of-3 timed, caches released between
runs, canary-normalized) but each query in its own fresh process, and
prints one JSON line to merge as the ``isolated`` block of
``bench_history/r{N}.json``.

Usage:
    python tools/bench_isolated.py q1 q2 ...         # parent: one JSON line
    python tools/bench_isolated.py --one q1          # child mode
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def one(name: str) -> None:
    from bench import run_canary
    from big_data_tools_spark.session import get_spark
    from big_data_tools_spark.operators.cache import (
        release_all_caches,
        release_caches,
    )
    from big_data_tools_spark.queries import all_queries

    spark = get_spark(app_name=f"bdt-isolated-{name}")
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    canary_sec, _ = run_canary(spark)
    spec = all_queries()[name]

    def run() -> int:
        df = spec.fn(spark, SF_DIR)
        n = df.count()
        release_caches(df)
        release_all_caches()
        return n

    for _ in range(2):
        run()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "name": name,
        "sec": round(best, 3),
        "canary_sec": canary_sec,
        "normalized": round(best / canary_sec, 3),
    }))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if "--one" in sys.argv:
        one(names[0])
        return
    if not names:
        sys.exit("usage: python tools/bench_isolated.py q1 q2 ...")
    out: dict = {"sf_dir": SF_DIR, "queries": {}}
    for n in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", n],
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            out["queries"][n] = {"error": proc.stderr[-500:]}
            continue
        row = json.loads(proc.stdout.strip().splitlines()[-1])
        out["queries"][n] = {
            "sec": row["sec"],
            "canary_sec": row["canary_sec"],
            "normalized": row["normalized"],
        }
        print(f"# {n}: {row['sec']}s canary {row['canary_sec']}s "
              f"-> {row['normalized']} units", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
