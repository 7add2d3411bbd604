#!/usr/bin/env python
"""Capture one registered query's .explain("formatted") output to a
file — the plans/r{N}/<query>_{before,after}.txt evidence the
optimization rounds commit alongside each plan-affecting change.

Usage: python tools/capture_plan.py <query> <outfile>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_tools_spark.plans.lint import explain_text  # noqa: E402
from big_data_tools_spark.queries import all_queries  # noqa: E402
from big_data_tools_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name, outfile = sys.argv[1], sys.argv[2]
    spark = get_spark(app_name=f"bdt-plan-{name}")
    df = all_queries()[name].fn(spark, SF_DIR)
    text = explain_text(df, "formatted")
    with open(outfile, "w") as f:
        f.write(text)
    print(f"wrote {outfile} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
