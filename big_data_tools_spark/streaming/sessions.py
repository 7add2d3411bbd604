"""Custom stateful streaming operator: gap-based session windows via
``applyInPandasWithState`` (SURVEY.md §2.10 stretch — the path for
semantics Spark's built-in windowed aggregations can't express).

The batch twin is ``event_sessions`` (queries/advanced.py): same
30-minute-gap rule via lag + running-sum windows. The streaming form
keeps one open session per user in state, emits a session as soon as a
later event closes it (gap exceeded), and relies on event-time timeout
(watermark-driven) to flush sessions that go quiet.

State size is bounded by #active users x one (start, end, n) triple —
the watermark expires idle state, which is what makes this run forever
at stream scale. Timestamps travel as epoch micros (long) through the
Arrow boundary; pandas datetime round-trips would re-introduce the
ns/µs precision trap.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, start_us bigint, end_us bigint, n_events bigint"
STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def _make_sessionizer(gap_sec: int):
    gap_us = gap_sec * 1_000_000

    def sessionize(key: tuple, pdfs: Iterator[Any], state: GroupState):
        import pandas as pd

        def emit(rows):
            return pd.DataFrame(
                [
                    {"user_id": key[0], "start_us": s, "end_us": e, "n_events": n}
                    for s, e, n in rows
                ]
            )

        if state.hasTimedOut:
            closed = [tuple(state.get)] if state.exists else []
            state.remove()
            if closed:
                yield emit(closed)
            return

        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf["ts_us"])
        # Merge as INTERVALS, not a left-to-right fold over the open
        # session: a late event in a later micro-batch may precede the
        # open session's end (or even its start). The fold moved the
        # session end BACKWARDS (cur[1] = t unconditionally) and never
        # extended the start — order-insensitive interval merging keeps
        # closed-session output identical to the batch twin for any
        # arrival order within the watermark.
        intervals = [[t, t, 1] for t in sorted(ts_all)]
        if state.exists:
            intervals.append(list(state.get))
            intervals.sort(key=lambda iv: iv[0])
        merged: list[list[int]] = []
        for iv in intervals:
            if merged and iv[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], iv[1])
                merged[-1][2] += iv[2]
            else:
                merged.append(iv)
        closed = [tuple(m) for m in merged[:-1]]
        cur = merged[-1] if merged else None
        if cur is not None:
            state.update(tuple(cur))
            # flush the open session once the watermark passes end + gap
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_sec * 1000)
        if closed:
            yield emit(closed)

    return sessionize


def sessionize_stream(
    events: DataFrame, gap_sec: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user over a (streaming or batch-drained)
    events frame with a ``ts`` timestamp column. Emits one row per
    CLOSED session: (user_id, session_start, session_end, n_events,
    duration_sec)."""
    ev = (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", F.unix_micros(F.col("ts")).alias("ts_us"))
    )
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_sec),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    return sessions.select(
        "user_id",
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
        F.timestamp_micros(F.col("end_us")).alias("session_end"),
        "n_events",
        # per-endpoint second truncation, matching the batch twin's
        # max(ts).cast(long) - min(ts).cast(long)
        (F.expr("end_us div 1000000") - F.expr("start_us div 1000000")).alias(
            "duration_sec"
        ),
    )
