"""Key-distribution diagnostics: heavy hitters, share concentration,
and a Gini coefficient over group sizes — the numbers you need BEFORE
choosing a join/agg strategy at 100 TB (broadcast? salt? AQE skew
join?).

The engine's salting (`operators/skew.py`) and the AQE skew-join flag
fix skew once known; this operator is the measurement side: one
grouped count (partial-agg friendly) plus windows over the ALREADY
AGGREGATED per-key frame (|keys| rows, never the fact table), so the
report costs one fact shuffle regardless of table size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_counts(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """(keys..., cnt) — the per-key grouped count all reports share."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def heavy_hitters(
    df: DataFrame, keys: Sequence[str], top_n: int = 10
) -> DataFrame:
    """Top-N keys by row count with their share of the total:
    (keys..., cnt, share, rank). Deterministic ties via the key
    columns; the share divides by a broadcast 1-row total (no driver
    collect)."""
    counts = key_counts(df, keys)
    total = counts.agg(F.sum("cnt").alias("total"))
    ranked = (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.col("cnt").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_n)
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("cnt").desc(), *[F.col(k).asc() for k in keys]
                )
            )
            .cast("long"),
        )
    )
    return ranked


def skew_summary(df: DataFrame, keys: Sequence[str], top_n: int = 10) -> DataFrame:
    """One-row skew report over the key distribution:

    - ``n_keys``, ``n_rows``
    - ``max_share`` — largest single key's fraction (the reducer that
      dies first)
    - ``topn_share`` — fraction held by the ``top_n`` largest keys
    - ``gini`` — Gini coefficient of group sizes (0 = uniform,
      ->1 = one key holds everything), closed form over
      ascending-sorted counts: G = 2*sum(i*c_i)/(n*sum(c)) - (n+1)/n.

    Scale shape: ranking billions of keys globally for the Gini sum
    would itself be a single-reducer sort — the anti-pattern this
    operator diagnoses. Instead the rank sum is computed EXACTLY from
    the group-SIZE histogram: keys with equal counts occupy a
    contiguous rank run [cum_m+1, cum_m+m], whose rank sum is
    m*cum_m + m*(m+1)/2, so sum(i*c_i) = sum over distinct sizes of
    cnt * that run sum. The only window runs over |distinct sizes|
    rows (thousands at worst — sizes are integers), the top-N share
    comes from a TakeOrderedAndProject, and everything else is plain
    aggregation. Three tiny 1-row frames broadcast-cross-join at the
    end.
    """
    counts = key_counts(df, keys)

    # group-size histogram: |distinct sizes| rows, inherently small
    sizes = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("m"))
    w = (
        Window.orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gini_parts = sizes.select(
        "cnt",
        "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).alias("cum_m"),
    ).select(
        F.col("cnt"),
        F.col("m"),
        (
            F.col("cnt")
            * (F.col("m") * F.col("cum_m") + F.col("m") * (F.col("m") + 1) / 2)
        ).alias("rank_weighted"),
    )
    base = gini_parts.agg(
        F.sum("m").alias("n_keys"),
        F.sum(F.col("cnt") * F.col("m")).alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.sum("rank_weighted").alias("rw"),
    )

    topn = (
        counts.orderBy(F.col("cnt").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_n)
        .agg(F.sum("cnt").alias("topn_rows"))
    )
    return (
        base.crossJoin(F.broadcast(topn))
        .select(
            "n_keys",
            "n_rows",
            F.round(F.col("max_cnt") / F.col("n_rows"), 6).alias("max_share"),
            F.round(F.col("topn_rows") / F.col("n_rows"), 6).alias("topn_share"),
            F.round(
                2.0 * F.col("rw") / (F.col("n_keys") * F.col("n_rows"))
                - (F.col("n_keys") + 1) / F.col("n_keys"),
                6,
            ).alias("gini"),
        )
    )


def kanonymity_violations(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier combinations shared by fewer than ``k`` rows —
    the groups whose members a release would re-identify (Sweeney's
    k-anonymity). One grouped count + HAVING; nulls group together
    (a null quasi-identifier is still a quasi-identifier)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )
