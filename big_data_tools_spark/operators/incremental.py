"""Incremental aggregate maintenance: merge mergeable per-key
aggregate STATES (count / exact-decimal sum / min / max) so a stored
rollup can absorb a delta without re-scanning history.

The reference recomputes every rollup from scratch on each run
(`Databricks Notebook.py` — the notebook re-reads the full table for
every groupBy). At 100 TB that is the difference between scanning one
day's partition and scanning three years of them: keep the rollup at
STATE grain (count + decimal sum, from which avg derives), aggregate
only the delta, and merge — states are commutative monoids, so
``merge(state(A), state(B)) == state(A ∪ B)`` exactly, and the merge
shuffles only |keys| rows, not |rows|.

Derived metrics (avg) must NOT be stored — they don't merge. They are
projected in :func:`finish_rollup` after the merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

# state column suffixes produced by aggregate_state
_STATE_COLS = ("n", "sum", "min", "max")


def aggregate_state(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Per-key mergeable state for ``value_col``: row count, exact
    DECIMAL(28,2) sum (decimal addition is associative, so the state is
    partition-order independent and merge order never matters), min and
    max. One hash shuffle on ``keys`` with map-side partial agg."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(v.cast("decimal(28,2)")).alias("sum"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def merge_states(keys: Sequence[str], *states: DataFrame) -> DataFrame:
    """Merge any number of state frames produced by
    :func:`aggregate_state` over the same keys: union, then one
    |keys|-sized re-aggregate (count→sum, sum→sum, min→min, max→max)."""
    if not states:
        raise ValueError("merge_states needs at least one state frame")
    for s in states:
        missing = [c for c in (*keys, *_STATE_COLS) if c not in s.columns]
        if missing:
            raise ValueError(f"state frame missing columns: {missing}")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum").alias("sum"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )


def finish_rollup(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Project the user-facing rollup from a state frame: count, sum
    and avg rounded to 2 (money policy, functions/agg), min, max."""
    return state.select(
        *keys,
        F.col("n").alias("n_rows"),
        F.round(F.col("sum").cast("double"), 2).alias("total"),
        # divide AFTER the double cast: both engines then divide the
        # identical IEEE double by the identical count — bit-equal —
        # whereas decimal division rounds at engine-specific scales
        F.round(F.col("sum").cast("double") / F.col("n"), 2).alias("mean"),
        F.col("min").alias("lo"),
        F.col("max").alias("hi"),
    )
