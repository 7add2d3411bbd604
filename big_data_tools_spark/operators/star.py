"""Star-join composer (SURVEY.md §2.4 J1-J2, §4.4).

The reference's basetable build is ten sequential single-key equi-joins
(``Databricks Notebook.py:347-641``) grafting per-business aggregates
onto the label table. This operator composes the same shape with:

- explicit broadcast of dimension sides below a size threshold (at
  reference scale all right sides are small; at 100 TB the flag flips
  per-dimension and AQE handles the rest);
- an optional grain assertion (unique key) per right side — the
  invariant the reference checks by eye via
  ``select(k).distinct().count()`` (``:296``). A non-unique right side
  silently fans out rows, the classic star-join bug.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GrainError(ValueError):
    pass


def assert_unique_key(df: DataFrame, keys: Sequence[str]) -> None:
    """Raise if ``keys`` is not a unique key of ``df`` (one count job)."""
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise GrainError(f"key {list(keys)} is not unique")


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Sequence[str] | str, str]],
    broadcast_dims: bool = True,
    check_grain: bool = False,
) -> DataFrame:
    """Join each ``(dim, on, how)`` onto ``fact`` left-to-right.

    ``on`` is a column name or list (equi-join keys); ``how`` is
    ``"left"``/``"inner"`` (the only kinds the reference uses).
    """
    out = fact
    for dim, on, how in dims:
        keys = [on] if isinstance(on, str) else list(on)
        if check_grain:
            assert_unique_key(dim, keys)
        right = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(right, on=keys, how=how)
    return out
