"""Slowly-changing-dimension type-2 merge (beyond-reference extension).

The reference's pipeline treats dimensions as point-in-time snapshots
(features as-of March 2020, label from June 2020 — ``Final Report``
p.2); any production version of that pipeline re-runs against refreshed
dimensions, which is exactly the SCD-2 maintenance problem: apply an
update batch to a dimension snapshot while keeping full history, so
every fact row can join to the attribute values that were current at
its event time.

Spark-first design (one shuffle, one pass):

- ONE full-outer equi-join of snapshot vs updates on the business key —
  the only shuffle in the plan (both sides hash-partition on the key;
  with a bucketed dimension table even that shuffle disappears).
- Change detection with null-safe equality (``eqNullSafe``) so a NULL
  attribute transitioning to a value — or vice versa — counts as a
  change instead of vanishing into SQL three-valued logic.
- Each joined row then emits 0, 1, or 2 output rows (carried / closed +
  new version / inserted). Emitting via an array-of-structs + one
  ``explode`` keeps it a single projection over the join output —
  unioning three filtered projections of the same join would scan the
  joined frame three times (or force a persist).

At 100 TB: cost is one key-partitioned shuffle of dim ∪ updates, no
window, no driver sync; AQE handles skewed business keys. The output
preserves the dimension's grain invariant (≤1 current row per key),
asserted in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    eff_date: str | Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current: str = "is_current",
) -> DataFrame:
    """Apply an update batch to a type-2 dimension snapshot.

    ``dim``: current snapshot — one row per ``key`` with ``attrs`` and a
    ``valid_from`` column. ``updates``: one row per ``key`` with the new
    ``attrs`` values, all effective at ``eff_date`` (a literal date
    string or Column).

    Returns the merged history:

    - key only in ``dim``, or in both with identical attrs → row carried
      unchanged (still current);
    - key in both with any attr changed (null-safe) → old row closed at
      ``eff_date`` + new current row;
    - key only in ``updates`` → new current row starting ``eff_date``.
    """
    eff = F.lit(eff_date).cast("date") if isinstance(eff_date, str) else eff_date
    d = dim.select(
        F.col(key).alias("__k"),
        *[F.col(a).alias(f"__d_{a}") for a in attrs],
        F.col(valid_from).alias("__d_from"),
    )
    # presence flags must not depend on attr nullability (an all-NULL
    # attrs row is still present): tag each side explicitly
    d = d.withColumn("__d_present", F.lit(True))
    u = updates.select(
        F.col(key).alias("__k"),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.lit(True).alias("__u_present"),
    )
    j = d.join(u, on="__k", how="full_outer")
    in_dim = F.col("__d_present").isNotNull()
    in_upd = F.col("__u_present").isNotNull()

    changed = in_dim & in_upd
    same = F.lit(True)
    for a in attrs:
        same = same & F.col(f"__d_{a}").eqNullSafe(F.col(f"__u_{a}"))
    changed = changed & ~same

    def row(side: str, vfrom: Column, vto: Column, cur: Column) -> Column:
        return F.struct(
            *[F.col(f"__{side}_{a}").alias(a) for a in attrs],
            vfrom.alias(valid_from),
            vto.alias(valid_to),
            cur.alias(current),
        )

    null_date = F.lit(None).cast("date")
    emitted = (
        F.when(
            changed,
            F.array(
                row("d", F.col("__d_from"), eff, F.lit(False)),
                row("u", eff, null_date, F.lit(True)),
            ),
        )
        .when(in_dim, F.array(row("d", F.col("__d_from"), null_date, F.lit(True))))
        .otherwise(F.array(row("u", eff, null_date, F.lit(True))))
    )
    out = j.select(F.col("__k").alias(key), F.explode(emitted).alias("__r"))
    return out.select(key, "__r.*")
