"""Opening-hours range parser (SURVEY.md §2.2 P7, §2.7 X6-X7).

The reference parses ``"9:0-21:0"``-style strings per weekday with a
7-iteration column loop (``Databricks Notebook.py:479-512``), applying
a +24h wraparound when close <= open (``:502-507``, e.g. ``"22:0-2:0"``
is a 4-hour window ending past midnight). Here: one operator, one
``withColumns`` batch, pure expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hours_open(col: Column) -> Column:
    """Opening hour (int) from ``"H:mm-H:mm"``."""
    return F.substring_index(F.split(col, "-").getItem(0), ":", 1).cast("int")


def hours_close(col: Column) -> Column:
    """Closing hour (int), before wraparound adjustment."""
    return F.substring_index(F.split(col, "-").getItem(1), ":", 1).cast("int")


def hours_availability(col: Column) -> Column:
    """Open-hours span with the reference's +24 wraparound rule:
    when close <= open the window crosses midnight, so add 24
    (``:502-507``); nulls propagate."""
    o, c = hours_open(col), hours_close(col)
    c_adj = F.when(c <= o, c + F.lit(24)).otherwise(c)
    return (c_adj - o).cast("int")


def parse_hours_range(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """For each ``out_prefix -> source_col`` add ``{p}_open``,
    ``{p}_close`` (wraparound-adjusted) and ``{p}_avail`` columns in a
    single ``withColumns`` batch (vs the reference's per-column loop)."""
    new = {}
    for prefix, src in cols.items():
        c = F.col(src)
        o, cl = hours_open(c), hours_close(c)
        cl_adj = F.when(cl <= o, cl + F.lit(24)).otherwise(cl)
        new[f"{prefix}_open"] = o
        new[f"{prefix}_close"] = cl_adj
        new[f"{prefix}_avail"] = (cl_adj - o).cast("int")
    return df.withColumns(new)
