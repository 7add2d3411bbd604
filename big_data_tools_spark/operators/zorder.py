"""Z-order (Morton) clustering key — multi-column data skipping.

``compact(cluster_by=[a, b])`` range-sorts linearly: files get narrow
min/max spans on ``a`` but each file still spans ALL of ``b``, so
filters on ``b`` alone skip nothing. Interleaving the bits of both
columns into one Morton key and range-partitioning on THAT gives every
file a narrow span on every participating column — parquet row-group /
file skipping then prunes scans filtered on any of them. This is the
technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, built here from
pure Catalyst expressions (shift/mask/or — whole-stage codegen, no
UDF).

Shape: two distributed 1-row min/max aggregates (broadcast, the
operators/scalar.py pattern — no driver collect) scale each column to
a 16-bit rank, then a fixed 32-term bit-interleave expression builds
the key. Cost at any scale: one tiny broadcast per column + one
range-shuffle, the same shuffle the linear sort needs anyway.

Caveats (documented, test-pinned): 16 bits per dimension caps
distinguishable values at 65,536 ranks per column — beyond that,
neighboring values share a rank, which only coarsens skipping, never
breaks correctness. Nulls rank as 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16


def _scaled_rank(df: DataFrame, col: str) -> tuple[DataFrame, Column]:
    """Attach broadcast 1-row min/max for ``col`` and return the
    16-bit scaled rank expression over them."""
    mn, mx = f"__zmin_{col}", f"__zmax_{col}"
    agg = df.agg(
        F.min(F.col(col)).alias(mn), F.max(F.col(col)).alias(mx)
    )
    out = df.crossJoin(F.broadcast(agg))
    span = F.col(mx).cast("double") - F.col(mn).cast("double")
    rank = F.when(span <= 0, F.lit(0)).otherwise(
        F.floor(
            (F.col(col).cast("double") - F.col(mn).cast("double"))
            / span
            * ((1 << _BITS) - 1)
        )
    )
    return out, F.coalesce(rank, F.lit(0)).cast("long")


def with_zorder_key(df: DataFrame, cols: list[str], key_col: str = "__zkey") -> DataFrame:
    """Add a Morton-interleaved ``key_col`` over two numeric columns.

    Two dimensions keep the interleave expression compact (32 terms);
    for more dimensions, z-order the two most-filtered columns and
    range-sort the rest — skipping benefit falls off fast past two
    anyway.
    """
    if len(cols) != 2:
        raise ValueError(f"z-order supports exactly 2 columns, got {cols}")
    out, ra = _scaled_rank(df, cols[0])
    out, rb = _scaled_rank(out, cols[1])
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(_BITS):
        # Column & / | are BOOLEAN ops in PySpark; bit math needs the
        # explicit bitwise methods
        za = F.shiftleft(F.shiftrightunsigned(ra, i).bitwiseAND(one), 2 * i + 1)
        zb = F.shiftleft(F.shiftrightunsigned(rb, i).bitwiseAND(one), 2 * i)
        z = z.bitwiseOR(za).bitwiseOR(zb)
    keep = [c for c in df.columns]
    return out.select(*keep, z.alias(key_col))


def zorder_compact(
    df: DataFrame,
    cols: list[str],
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Range-partition + sort on the Morton key, sized like
    :func:`~big_data_tools_spark.operators.partitioning.compact` —
    write the result and every file carries narrow min/max on BOTH
    ``cols``. The helper key is dropped before writing."""
    import math

    keyed = with_zorder_key(df, cols)
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    n = max(1, math.ceil(int(stats.sizeInBytes()) / target_partition_bytes))
    return (
        keyed.repartitionByRange(n, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
