"""Keyed snapshot diff: added / removed / changed rows between two
versions of a table, plus per-column change counts — the "what did
this refresh actually do" tool for pipelines that overwrite tables
(the reference's notebook rebuilds its basetable blind;
`Databricks Notebook.py` has no way to see a refresh's blast radius).

Scale shape: ONE full-outer shuffle on the key (both sides hashed the
same way — co-partitioned if the tables are bucketed on the key), with
change detection as null-safe column comparisons inside the join
projection. The per-column rollup is a 1-row aggregate over the diff.
Composes with ``cdc.apply_changes`` (diff two snapshots -> a change
feed) and ``scd2_apply`` (keep the history the diff reveals).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff: one row per key present in either snapshot with
    ``change_type`` ('I' = only in new, 'D' = only in old, 'U' =
    in both with at least one compared column differing null-safely),
    the new-side values, and ``changed_cols`` (sorted array of
    differing column names; empty for I/D). Unchanged keys are
    dropped.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    missing = [c for c in compare_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare_cols absent from a snapshot: {missing}")

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")

    in_old = F.col(f"__ok_{keys[0]}").isNotNull()
    in_new = F.col(f"__nk_{keys[0]}").isNotNull()
    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change_type = (
        F.when(in_old & ~in_new, F.lit("D"))
        .when(~in_old & in_new, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
            for k in keys
        ],
        change_type.alias("change_type"),
        F.when(in_old & in_new, diffs).otherwise(F.array().cast("array<string>")).alias(
            "changed_cols"
        ),
        *[F.col(f"__n_{c}").alias(c) for c in compare_cols],
    )
    return out.filter(
        (F.col("change_type") != "U") | (F.size("changed_cols") > 0)
    )


def diff_summary(diff: DataFrame, compare_cols: Sequence[str]) -> DataFrame:
    """One-row rollup of a :func:`snapshot_diff`: n_inserted /
    n_deleted / n_updated plus a changed-row count per compared
    column — a single aggregate pass."""
    # coalesce to 0: sum() over an EMPTY diff (identical snapshots —
    # the most common deploy-gate outcome) is NULL, and a gate that
    # prints "n_updated": null instead of 0 reads as broken (r9)
    def zsum(cond, name):
        return F.coalesce(
            F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
        ).cast("bigint").alias(name)

    aggs = [
        zsum(F.col("change_type") == "I", "n_inserted"),
        zsum(F.col("change_type") == "D", "n_deleted"),
        zsum(F.col("change_type") == "U", "n_updated"),
    ]
    aggs += [
        zsum(F.array_contains(F.col("changed_cols"), c), f"n_changed_{c}")
        for c in compare_cols
    ]
    return diff.agg(*aggs)
