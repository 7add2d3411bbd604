"""Stream-stream interval join (SURVEY.md §2.10 stretch).

The last Structured Streaming join shape the engine needed: two
streams joined on a key plus an event-time interval condition —
"clicks in the hour before each purchase", the streaming twin of the
batch ``purchase_click_window`` query (operators/rangejoin.py).

How Spark bounds the state: an inner stream-stream join buffers BOTH
sides, but with watermarks on both event-time columns AND a time-range
join condition the engine derives a state watermark per side — a click
older than (purchase watermark) can never match a future purchase, and
a purchase older than (click watermark + window) can never match a
future click — so both buffers are evicted continuously. Without the
interval condition the state would grow without bound; that is why
this operator REQUIRES the range predicate rather than accepting an
arbitrary boolean condition.

One code path for batch and stream (the watermarks are skipped on
batch frames, where the same expression tree runs as a plain
self-join), so the stream==batch test and the driver's rows-only check
exercise identical logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_pairs(
    events: DataFrame,
    window_sec: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """(purchase, click) pairs for the same user with the click in the
    ``window_sec`` seconds up to the purchase. Emits one row per
    matched pair: (event_id, user_id, cts, value).

    Works on a streaming frame (append-mode inner join, state bounded
    by the watermarks + interval as described in the module doc) and on
    a batch frame (plain self-join) with identical semantics.
    """
    purch = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("cts"),
        "value",
    )
    if events.isStreaming:
        purch = purch.withWatermark("pts", watermark)
        clicks = clicks.withWatermark("cts", watermark)
    cond = F.expr(
        "user_id = click_user AND "
        f"cts >= pts - INTERVAL {int(window_sec)} SECONDS AND cts <= pts"
    )
    return purch.join(clicks, cond, "inner").select(
        "event_id", "user_id", "cts", "value"
    )


def unattributed_purchases(
    events: DataFrame,
    window_sec: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Purchases with NO click by the same user in the ``window_sec``
    seconds before them: (event_id, user_id, pts) — the left-outer
    complement of :func:`purchase_click_pairs` and the campaign-health
    stream ("conversions we cannot attribute").

    Streaming semantics are the interesting part: a LEFT OUTER
    stream-stream join cannot emit the null-extended row when the
    purchase arrives — a matching click may still be in flight — so
    the engine holds the purchase in state and emits the null row only
    once the click-side state watermark passes (purchase time +
    window). The emitted stream is therefore delayed by the watermark
    by DESIGN, and purchases newer than the final watermark at drain
    time stay buffered (tests assert containment plus completeness
    behind the watermark horizon, not naive equality). Batch frames
    run the same expression tree as a plain left join; both modes
    filter the null click side.
    """
    purch = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("cts"),
    )
    if events.isStreaming:
        purch = purch.withWatermark("pts", watermark)
        clicks = clicks.withWatermark("cts", watermark)
    cond = F.expr(
        "user_id = click_user AND "
        f"cts >= pts - INTERVAL {int(window_sec)} SECONDS AND cts <= pts"
    )
    return (
        purch.join(clicks, cond, "left_outer")
        .filter(F.col("cts").isNull())
        .select("event_id", "user_id", "pts")
    )
