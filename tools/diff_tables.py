#!/usr/bin/env python
"""Keyed diff of two parquet tables from the command line.

    python tools/diff_tables.py OLD NEW --keys k1[,k2]
    python tools/diff_tables.py OLD NEW --keys k1 --compare c1,c2 --sample 5

Wraps operators/tablediff.py ``snapshot_diff`` + ``diff_summary``:
one full-outer key join, null-safe column comparison, I/D/U triage
with per-column changed counts — the deploy-gate check for "what did
this rebuild actually change". Prints one JSON summary line, plus a
sample of changed rows with ``--sample``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[1].strip())
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--keys", required=True, help="comma-separated key columns")
    p.add_argument("--compare", default=None,
                   help="comma-separated columns to compare (default: all non-key)")
    p.add_argument("--sample", type=int, default=0,
                   help="show this many changed rows")
    args = p.parse_args(argv)

    from big_data_tools_spark.operators.tablediff import diff_summary, snapshot_diff
    from big_data_tools_spark.session import get_spark

    spark = get_spark(app_name="diff-tables")
    old = spark.read.parquet(args.old)
    new = spark.read.parquet(args.new)
    keys = [k.strip() for k in args.keys.split(",")]
    compare = (
        [c.strip() for c in args.compare.split(",")]
        if args.compare
        else [c for c in new.columns if c not in keys]
    )
    diff = snapshot_diff(old, new, keys, compare).persist()
    summary = {k: v for k, v in diff_summary(diff, compare).first().asDict().items()}
    if args.sample:
        diff.show(args.sample, truncate=40)
    diff.unpersist()
    print(json.dumps({"old": args.old, "new": args.new, **summary}, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
