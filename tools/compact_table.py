#!/usr/bin/env python
"""Table maintenance CLI: rewrite a parquet directory as right-sized,
optionally clustered files.

    python tools/compact_table.py SRC DEST                      # compact
    python tools/compact_table.py SRC DEST --cluster-by k       # + range-cluster
    python tools/compact_table.py SRC DEST --zorder k1,k2       # + z-order

The periodic job that keeps a 100 TB table scannable: small files from
streaming sinks or fine-grained writes are coalesced toward
``--target-mb`` (from plan statistics — scans report real file sizes),
single-key clustering gives disjoint min/max spans for file skipping
on that key, and ``--zorder`` interleaves two keys so BOTH prune
(operators/zorder.py). Writes to DEST; swap-after-write is the
caller's move (an in-place rewrite that fails midway loses the table).
Prints one JSON line with before/after layout stats from the Hadoop
FileSystem API.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[1].strip())
    p.add_argument("src")
    p.add_argument("dest")
    p.add_argument("--target-mb", type=int, default=128)
    p.add_argument("--cluster-by", default=None,
                   help="range-cluster + sort on this column")
    p.add_argument("--zorder", default=None,
                   help="comma-separated pair of columns to z-order")
    args = p.parse_args(argv)
    if args.cluster_by and args.zorder:
        p.error("--cluster-by and --zorder are mutually exclusive")

    from big_data_tools_spark.io.sinks import parquet_layout_stats
    from big_data_tools_spark.operators.partitioning import compact
    from big_data_tools_spark.operators.zorder import zorder_compact
    from big_data_tools_spark.session import get_spark

    spark = get_spark(app_name="compact-table")
    target = args.target_mb * 1024 * 1024
    before = parquet_layout_stats(spark, args.src)
    df = spark.read.parquet(args.src)
    if args.zorder:
        cols = [c.strip() for c in args.zorder.split(",")]
        if len(cols) != 2:
            p.error("--zorder takes exactly two columns")
        out = zorder_compact(df, cols, target_partition_bytes=target)
    else:
        out = compact(
            df,
            target_partition_bytes=target,
            cluster_by=[args.cluster_by] if args.cluster_by else None,
        )
    out.write.mode("overwrite").parquet(args.dest)
    after = parquet_layout_stats(spark, args.dest)
    n_rows = spark.read.parquet(args.dest).count()
    print(json.dumps({
        "src": args.src, "dest": args.dest,
        "before": {"n_files": before[0], "bytes": before[1]},
        "after": {"n_files": after[0], "bytes": after[1]},
        "rows": n_rows,
    }, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
