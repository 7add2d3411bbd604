"""Free-rider audit metrics via the Observation API (SURVEY.md §2.1
S5 modernized).

The reference probes shape with ``df.count()`` after every load/join
(``Databricks Notebook.py:39,53,67,85,99,116,208,220,723`` — nine
probes, each a FULL extra scan of the input). ``df.observe`` attaches
aggregate expressions to a plan that are computed as accumulators
DURING whatever action runs anyway — row counts, null rates, and
domain checks cost zero additional scans at any data size. At 100 TB
the difference is nine wasted full-table passes.

Constraint inherited from Spark: observed metrics must be aggregate
expressions with no distinct/filter-clause forms; conditional counts
ride ``count(when(...))`` exactly like A10/A11 audits.

Spark 4.1.2 caveat (regression-pinned in tests/test_operators.py):
the session's ObservationManager initializes lazily on the first
``observe`` and is NOT serializable. Once initialized, any later task
closure whose serialization graph reaches the SparkSession — notably
an ML model carrying its training summary — throws
NotSerializableException. When mixing observations and ML fits in one
process, build the observed frame on a forked ``spark.newSession()``
(shares the SparkContext; parent session stays clean), as
``observed_rollup_audit`` does.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_audit(
    df: DataFrame,
    metrics: Mapping[str, Column] | None = None,
    null_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, Observation]:
    """Attach audit metrics to ``df`` computed on its next action.

    Default metrics: ``n_rows``; plus ``null_<c>`` null counts for each
    column in ``null_cols``; plus any caller-supplied named aggregate
    columns. Returns (observed_df, observation) — run ONE action on the
    observed frame, then read ``observation.get``.
    """
    obs = Observation()
    exprs: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in null_cols:
        exprs[f"null_{c}"] = F.count(F.when(F.col(c).isNull(), 1))
    for name, col in (metrics or {}).items():
        exprs[name] = col
    named = [col.alias(name) for name, col in exprs.items()]
    return df.observe(obs, *named), obs
