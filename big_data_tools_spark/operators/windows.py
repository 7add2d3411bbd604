"""Window / sort / limit operators (SURVEY.md §2.6).

Absent from the reference (its one ranking need is served by
collect+literal, ``Databricks Notebook.py:132-139``) but required for a
usable analytics surface and for deterministic oracle output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ``row_number`` (one shuffle on keys).

    ``order_by`` must be a *total* order (include a unique tiebreaker
    column) or results are nondeterministic. Rank is cast to long so
    the schema matches DuckDB's BIGINT ``row_number``.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
