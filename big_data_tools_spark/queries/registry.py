"""Registry mapping query names to (Spark callable, DuckDB oracle SQL).

Contract (see ``__spark_entry__.py``): each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL runs on
DuckDB views named after the parquet tables. Column names must match
exactly between the two (the driver sorts columns by name and hashes
values), so every computed column is aliased identically on both sides.

Float policy: aggregate doubles are rounded to 2 decimals on BOTH sides
— Spark and DuckDB sum doubles in different orders, so unrounded sums
differ in final ulps; rounding collapses that while keeping the check
meaningful.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle twin; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]
