"""Distributed scalar aggregates (SURVEY.md §2.5 A6, §4.3 fix).

The reference computes ``select(max(c)).collect()`` and re-embeds the
Python scalar as a literal (``Databricks Notebook.py:135-136,668-669``)
— two jobs with a driver synchronization point. Here the scalar stays
in the plan: a 1-row aggregate broadcast-cross-joined onto the input,
so Catalyst keeps everything in one job and there is no driver
round-trip regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_global_max(df: DataFrame, expr: Column, out: str) -> DataFrame:
    """Attach ``max(expr)`` over the whole input as column ``out``."""
    one_row = df.agg(F.max(expr).alias(out))
    return df.crossJoin(F.broadcast(one_row))


def with_global_agg(df: DataFrame, **aggs: Column) -> DataFrame:
    """Attach arbitrary whole-table aggregates as columns.

    ``with_global_agg(df, mx=F.max("x"), total=F.sum("y"))``
    """
    one_row = df.agg(*[c.alias(name) for name, c in aggs.items()])
    return df.crossJoin(F.broadcast(one_row))
