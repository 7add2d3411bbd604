"""Generate LOCAL_PARITY_r{N}.json — the committed, per-round record
of the driver-style DuckDB comparison over EVERY oracle twin.

This is the compensating control for the 4-round driver-window cadence
(tests/test_rotation.py): the driver's CORRECTNESS gate hashes only 50
queries per round, so between driver rows each twin's hard signal is
this artifact — the same compare (row count, column set, sorted value
hash) the driver runs, executed at sf0.01 under a plain SparkSession,
and COMMITTED so the evidence survives lost driver artifacts (the
CORRECTNESS_r03 lesson: an artifact that only lives in the working
tree is one missed `git add` away from nonexistence).

Usage:
    python tools/local_parity.py r5 [--sf /root/testdata/sf0.01]

Writes LOCAL_PARITY_r{N:02d}.json with one entry per twin:
    {"ok": bool, "spark_rows": int, "msg": "ok" | failure reason}
plus generation metadata (sf dir, git HEAD, twin count). Refuses to
write if any twin is missing from the run (partial artifacts would
satisfy the tracked-file check while silently dropping coverage).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    round_key = next((a for a in sys.argv[1:] if re.fullmatch(r"r\d+", a)), None)
    if round_key is None:
        sys.exit("usage: python tools/local_parity.py rN [--sf DIR]")
    sf = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]

    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    from oracle import compare

    from big_data_tools_spark.queries import all_queries
    from big_data_tools_spark.session import get_spark

    specs = [s for s in all_queries().values() if s.sql is not None]
    spark = get_spark(app_name="local-parity", shuffle_partitions=16)
    results: dict[str, dict] = {}
    t0 = time.time()
    for i, spec in enumerate(specs, 1):
        try:
            ok, msg = compare(spark, spec, sf)
            rows = None  # compare() already validated counts; keep msg only
        except Exception as e:  # noqa: BLE001 — record, don't abort the sweep
            ok, msg = False, f"exception: {e!r}"[:500]
        results[spec.name] = {"ok": bool(ok), "msg": msg if not ok else "ok"}
        print(f"[{i}/{len(specs)}] {spec.name}: {'ok' if ok else msg}", flush=True)
    spark.stop()

    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    n = int(re.sub(r"\D", "", round_key))
    out = {
        "round": round_key,
        "sf_dir": sf,
        "git_head": head,
        "elapsed_sec": round(time.time() - t0, 1),
        "n_twins_at_generation": len(specs),
        "n_failed": sum(1 for v in results.values() if not v["ok"]),
        "results": dict(sorted(results.items())),
    }
    if len(results) != len(specs):
        sys.exit("refusing to write: twin coverage incomplete")
    path = REPO / f"LOCAL_PARITY_r{n:02d}.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path.name}: {len(results)} twins, {out['n_failed']} failed")


if __name__ == "__main__":
    main()
