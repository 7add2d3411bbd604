"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``big_data_tools_spark``; this module is a
thin adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_tools_spark.queries import ordered_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from big_data_tools_spark.queries.relational import order_rollup_flagship

    return order_rollup_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2,
    ordered so a capped driver sample covers every family first (the
    driver checks the leading entries; see registry._PRIORITY)."""
    return {name: spec.fn for name, spec in ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible query; rows-only
    ops (MinHash/SimHash/LSH — Spark-seeded hashing) are omitted."""
    return {
        name: spec.sql for name, spec in ordered_queries().items() if spec.sql is not None
    }
