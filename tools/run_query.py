#!/usr/bin/env python
"""Run any registry query from the command line.

    python tools/run_query.py order_rollup_flagship
    python tools/run_query.py dedup_minhash_pairs --sf-dir /root/testdata/sf0.1
    python tools/run_query.py regional_revenue --explain
    python tools/run_query.py --list

The human-facing companion to ``__spark_entry__``: list the queries,
run one, see its rows (bounded), or print its formatted physical plan
instead of executing it.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[1].strip())
    p.add_argument("name", nargs="?", help="registry query name")
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p.add_argument("--rows", type=int, default=20, help="rows to show")
    p.add_argument("--explain", action="store_true",
                   help="print the formatted plan instead of executing")
    p.add_argument("--list", action="store_true", dest="list_queries",
                   help="list registry queries (oracle twins marked *)")
    args = p.parse_args(argv)

    from big_data_tools_spark.queries import all_queries, get

    if args.list_queries or not args.name:
        for name, spec in sorted(all_queries().items()):
            mark = "*" if spec.sql is not None else " "
            print(f" {mark} {name}")
        return 0

    if args.name not in all_queries():
        print(f"unknown query: {args.name} (use --list)", file=sys.stderr)
        return 2

    from big_data_tools_spark.session import get_spark

    spark = get_spark(app_name=f"run-{args.name}")
    df = get(args.name).fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.rows, truncate=80)
        print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
