"""Time-series resampling with forward fill — an operator Spark lacks
natively (pandas ``resample``/``ffill`` equivalent), built from
sequence-explode + window ``last(ignorenulls)`` so it stays
distributed and one-shuffle.

Shape: per key, generate the regular timestamp grid between that key's
min and max observation (``sequence`` + ``explode`` — grid rows are
created executor-side, never on the driver), union with the
observations, and forward-fill values onto grid points with a running
``last(value, ignorenulls=True)`` window. Cost: one shuffle on the
key (the window sort); grid size is bounded per key by its own span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_sec: int = 3600,
) -> DataFrame:
    """Regular per-key grid at ``step_sec`` spacing with values
    forward-filled from the latest at-or-before observation.

    Returns (key, grid_sec, value). Grid points align to
    ``floor(ts/step)*step`` so buckets are engine-independent. When
    several observations share a bucket, the fill takes the max value
    in/before it (deterministic tie policy, documented).
    """
    sec = F.col(ts_col).cast("long")
    obs = df.select(
        F.col(key_col).alias("k"),
        (F.floor(sec / step_sec) * step_sec).cast("long").alias("sec"),
        F.col(value_col).alias("v"),
    )
    # collapse to one observation per (key, bucket): max value wins
    obs1 = obs.groupBy("k", "sec").agg(F.max("v").alias("v"))
    spans = obs1.groupBy("k").agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    grid = spans.select(
        "k",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(int(step_sec)))
        ).alias("sec"),
    )
    unioned = (
        grid.join(obs1, ["k", "sec"], "left")
    )
    w = (
        Window.partitionBy("k")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return unioned.select(
        F.col("k").alias(key_col),
        F.col("sec").alias("grid_sec"),
        F.last("v", ignorenulls=True).over(w).alias(value_col),
    )
