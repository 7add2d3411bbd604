"""Point-in-time (PIT) join: enrich facts with the dimension version
that was valid WHEN the fact happened — the consume side of the SCD-2
history that ``scd2.scd2_apply`` builds, and the correctness fix for
the reference's star join (`Databricks Notebook.py:620-642` joins
facts to TODAY's dimension snapshot, silently rewriting history —
e.g. revenue attributed to a segment the customer wasn't in at order
time).

Scale shape: a plain HASH equi-join on the business key with the
validity interval as a residual condition — NOT a range join; the
interval only disambiguates among the few versions of one key (SCD-2
version counts are small), so the probe fans out by versions-per-key
and the residual keeps exactly one. One shuffle per side (zero for
the dimension when it broadcasts). Versions are disjoint by SCD-2
construction, so the output grain equals the fact grain — assert it
with ``operators/star.py``-style grain checks in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    fact_key: str,
    dim_key: str,
    ts: Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Join each fact to the dimension version whose
    ``[valid_from, valid_to)`` interval contains ``ts`` (an open-ended
    current version has ``valid_to`` null). ``ts`` is a Column over
    the fact side, already cast to the validity columns' type."""
    if how not in ("inner", "left_outer", "left"):
        raise ValueError(f"how must be inner or left_outer, got {how!r}")
    cond = (
        (facts[fact_key] == history[dim_key])
        & (ts >= history[valid_from])
        & (history[valid_to].isNull() | (ts < history[valid_to]))
    )
    return facts.join(history, cond, how)
