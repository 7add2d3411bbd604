"""Single-pass data-quality gates (the dbt-test / expectations idea as
a Spark operator).

A pipeline stage that writes a 100 TB table should fail loudly when its
invariants break — but each naive `assert df.filter(bad).count() == 0`
is a FULL extra scan. ``check_constraints`` evaluates every expectation
as a conditional count inside ONE aggregate pass (A10/A11's
metaprogrammed-projection pattern) and raises with the per-check
violation counts; zero extra scans beyond that single aggregation, at
any number of checks.

Each check is a boolean Column that must hold for every row (nulls
count as violations — an unknown is not a pass). Key-uniqueness is a
grouped property, not a per-row predicate — use
``operators.star.assert_unique_key`` for grain checks. Compose with
``operators.observe.with_audit`` when the metrics should ride an
existing action instead of their own aggregate.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ConstraintViolation(ValueError):
    def __init__(self, counts: dict[str, int], total: int):
        self.counts, self.total = counts, total
        msg = ", ".join(f"{k}: {v} rows" for k, v in counts.items())
        super().__init__(f"constraint violations (of {total} rows): {msg}")


def _violation_exprs(checks: Mapping[str, Column]) -> list[Column]:
    """Per-check violation-count aggregates (nulls are violations).
    Check names may not start with ``__`` — that prefix is reserved
    for internal aliases (``__total``) and would silently collide."""
    bad_names = [n for n in checks if n.startswith("__")]
    if bad_names:
        raise ValueError(
            f"check names may not start with '__' (reserved): {bad_names}"
        )
    return [
        F.count(F.when(~F.coalesce(col, F.lit(False)), 1)).alias(name)
        for name, col in checks.items()
    ]


def constraint_report(df: DataFrame, checks: Mapping[str, Column]) -> DataFrame:
    """The non-raising form of :func:`check_constraints`: the same
    ONE-pass conditional-count aggregation, returned as a DataFrame of
    ``(check_name, violations)`` rows instead of raised. Stays fully
    in-plan (agg -> unpivot, no driver collect), so it composes as a
    query and never errors on dirty data — use it for reporting;
    use ``check_constraints`` as the hard pipeline gate."""
    if not checks:
        return df.sparkSession.createDataFrame(
            [], "check_name string, violations long"
        )
    wide = df.agg(*_violation_exprs(checks))
    return wide.unpivot(
        [], list(checks), "check_name", "violations"
    ).select("check_name", F.col("violations").cast("long").alias("violations"))


def check_constraints(df: DataFrame, checks: Mapping[str, Column]) -> dict[str, int]:
    """Validate ``checks`` (name -> must-hold-per-row boolean Column)
    in one aggregate job. Returns the per-check violation counts (all
    zero) on success; raises :class:`ConstraintViolation` listing only
    the failed checks otherwise."""
    if not checks:
        return {}
    exprs = [F.count(F.lit(1)).alias("__total")] + _violation_exprs(checks)
    row = df.agg(*exprs).first()
    counts = {name: int(row[name]) for name in checks}
    bad = {k: v for k, v in counts.items() if v > 0}
    if bad:
        raise ConstraintViolation(bad, int(row["__total"]))
    return counts
