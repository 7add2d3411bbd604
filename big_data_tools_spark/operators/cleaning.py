"""Cleaning / auditing operators (SURVEY.md §2.3 F6, §2.5 A9-A11).

Reference behaviors re-expressed:
- enum recode via ``when/otherwise`` chains (``Databricks
  Notebook.py:238,251-256,270-275``) → :func:`recode_enum`;
- per-column null audit built by metaprogrammed projection (``:648``)
  → :func:`null_audit`;
- sentinel-value audit (``:653``) → :func:`sentinel_audit`;
- ``dropDuplicates`` (``:160,611``) → :func:`dedup_keep_min`, a
  *deterministic* dedup (the raw ``dropDuplicates`` keeps an arbitrary
  row per key, which breaks oracle checking and reproducibility).

All operators are pure DataFrame -> DataFrame with no driver collect,
so they compose into a single Catalyst plan and scale with the input.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def recode_enum(
    df: DataFrame,
    colname: str,
    mapping: Mapping[str, str],
    default: str | None = None,
    out: str | None = None,
) -> DataFrame:
    """Recode enum-ish string values via one ``when/otherwise`` chain.

    ``mapping`` maps raw value -> recoded value; unmapped values fall
    back to ``default`` (or pass through unchanged when ``default`` is
    None). Nulls map to ``default`` when given.
    """
    c = F.col(colname)
    expr: Column | None = None
    for raw, coded in mapping.items():
        cond = c == F.lit(raw)
        expr = F.when(cond, F.lit(coded)) if expr is None else expr.when(cond, F.lit(coded))
    if expr is None:
        raise ValueError("empty mapping")
    expr = expr.otherwise(F.lit(default) if default is not None else c)
    return df.withColumn(out or colname, expr)


def recode_bulk(
    df: DataFrame,
    cols: Sequence[str],
    mapping: Mapping[str, str],
    default: str | None = None,
) -> DataFrame:
    """Apply one recode mapping to many columns in a single
    ``withColumns`` call (the reference's fold-left ``reduce`` over
    ``withColumn`` at ``:233-238`` re-runs the analyzer per column;
    one batched call keeps analysis O(1))."""

    def one(colname: str) -> Column:
        c = F.col(colname)
        expr = None
        for raw, coded in mapping.items():
            cond = c == F.lit(raw)
            expr = F.when(cond, F.lit(coded)) if expr is None else expr.when(cond, F.lit(coded))
        assert expr is not None
        return expr.otherwise(F.lit(default) if default is not None else c)

    return df.withColumns({c: one(c) for c in cols})


def null_audit(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """One-row DataFrame counting nulls (and NaNs for float columns)
    per column — metaprogrammed projection, single aggregation job."""
    cols = list(cols or df.columns)
    fields = {f.name: f.dataType.typeName() for f in df.schema.fields}
    aggs = []
    for c in cols:
        cond = F.col(c).isNull()
        if fields.get(c) in ("double", "float"):
            cond = cond | F.isnan(F.col(c))
        aggs.append(F.count(F.when(cond, True)).alias(c))
    return df.agg(*aggs)


def sentinel_audit(df: DataFrame, sentinel: str, cols: Sequence[str] | None = None) -> DataFrame:
    """One-row DataFrame counting occurrences of a sentinel string
    (e.g. ``"Missing"``) per column."""
    cols = list(cols or [f.name for f in df.schema.fields if f.dataType.typeName() == "string"])
    return df.agg(
        *[F.count(F.when(F.col(c) == F.lit(sentinel), True)).alias(c) for c in cols]
    )


def dedup_keep_min(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Deterministic dedup: one row per ``keys`` group, keeping the row
    with the minimum ``order_col``.

    Scale note: implemented as a window ``row_number`` over the key
    partition — a single hash-partition shuffle on the dedup keys, no
    self-join. Skewed keys are handled by AQE; for pathological skew,
    pre-aggregate with ``min_by`` instead.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
