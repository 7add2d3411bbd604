"""Cache-lifecycle helpers for operators that persist() intermediates.

Operators like ``jaccard_pairs`` / ``minhash_band_pairs`` persist an
intermediate frame that feeds several consumers (at scale this is the
difference between 1 and 4 corpus scans). The returned DataFrame is
lazy, so the operator cannot unpersist before the caller's action runs
— Spark's CacheManager would drop the blocks and the plan would
recompute from scratch. Instead the operator tags the result with the
frames it persisted (``track_cache``) and the CALLER releases them
after its terminal action (``release_caches``). bench.py and the test
fixtures do this between queries so back-to-back registry runs don't
accumulate cached partitions across a shared session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_bdt_cached_frames"


def track_cache(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Tag ``out`` with persisted upstream frames the caller must
    release. Tags accumulate (operators composing operators)."""
    frames = list(getattr(out, _ATTR, ()))
    for c in cached:
        frames.extend(getattr(c, _ATTR, ()))  # propagate nested tags
        if c.is_cached:
            frames.append(c)
    setattr(out, _ATTR, frames)
    return out


def release_caches(df: DataFrame) -> None:
    """Unpersist every frame tagged on ``df`` by :func:`track_cache`.
    Safe to call on untagged frames (no-op). Call AFTER the terminal
    action on ``df`` — releasing earlier forces a full recompute."""
    for c in getattr(df, _ATTR, ()):
        try:
            c.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    if hasattr(df, _ATTR):
        setattr(df, _ATTR, [])
