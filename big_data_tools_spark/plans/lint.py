"""Plan-lint helpers (SURVEY.md §4.2 'custom rules needed: none' — this
is plan *inspection*, not Catalyst rewriting).

Used by perf tests to assert the physical properties that matter at
100 TB: filters reach the parquet scan (PushedFilters), small dims
broadcast instead of shuffling, expression pipelines stay inside
whole-stage codegen, and the shuffle count matches the design.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — those are the cheap kind)."""
    text = explain_text(df, "formatted")
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", text)) + len(
        re.findall(r"^\s*\(\d+\)\s+Exchange\s*$", text, re.M)
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_text(df, "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reach a file scan."""
    text = explain_text(df, "formatted")
    return [m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text) if m.group(1)]


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (wider = fewer = better).

    Executes the frame first: under AQE codegen stages only exist in
    the *final* adaptive plan, so the pre-execution explain shows none.
    """
    df.collect()  # count() would build a different plan; execute THIS one
    text = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", text)))
