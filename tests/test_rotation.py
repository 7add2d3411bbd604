"""Mechanical enforcement of driver-window rotation (r2 VERDICT ask #7).

The driver only hard-checks the first 50 registry entries per round, so
without rotation an oracle twin can pass the local parity suite forever
while never receiving a driver CORRECTNESS row (exactly what happened
to 19 round-2 twins). ``checked_rounds.json`` records each committed
round's window; these tests fail the build if the manifest goes stale
or if any twin would go three consecutive rounds unchecked.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from big_data_tools_spark.queries import ordered_queries
from big_data_tools_spark.queries.registry import all_queries

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50


def _manifest() -> dict[str, list[str]]:
    return json.loads((REPO / "checked_rounds.json").read_text())


def _round_keys(data: dict[str, list[str]]) -> list[str]:
    keys = sorted(
        (k for k in data if not k.startswith("pending_")),
        key=lambda k: int(re.sub(r"\D", "", k)),
    )
    assert keys, "checked_rounds.json has no round entries"
    return keys


def test_manifest_matches_live_registry():
    """The latest manifest entry must be the registry's actual first-50
    — otherwise the manifest silently drifts from what the driver will
    check. Regenerate with ``python tools/update_checked_rounds.py``."""
    data = _manifest()
    latest = _round_keys(data)[-1]
    assert data[latest] == list(ordered_queries())[:WINDOW], (
        f"checked_rounds.json[{latest!r}] is stale — rerun "
        "tools/update_checked_rounds.py after editing _PRIORITY"
    )


def test_no_twin_unchecked_for_three_rounds():
    """Every oracle twin must appear in at least one of the last three
    checked windows — except twins REGISTERED this round that the
    saturated 50-slot window could not absorb, which are recorded in
    the current round's ``pending_`` list and may wait exactly one
    round (enforced by test_pending_twins_drain)."""
    data = _manifest()
    keys = _round_keys(data)
    recent = set().union(*(data[k] for k in keys[-3:]))
    pending_now = set(data.get(f"pending_{keys[-1]}", []))
    twins = [n for n, s in all_queries().items() if s.sql is not None]
    overdue = [t for t in twins if t not in recent and t not in pending_now]
    assert not overdue, (
        f"oracle twins unchecked for 3+ rounds (rotate into _PRIORITY): {overdue}"
    )


def test_pending_twins_drain():
    """A twin may sit in the pending queue for ONE round only: the
    next round's window must absorb it (pending lists of consecutive
    rounds must be disjoint), and the queue stays small."""
    data = _manifest()
    keys = _round_keys(data)
    cur = set(data.get(f"pending_{keys[-1]}", []))
    assert len(cur) <= 10, f"pending queue too large: {sorted(cur)}"
    if len(keys) >= 2:
        prev = set(data.get(f"pending_{keys[-2]}", []))
        stuck = cur & prev
        assert not stuck, (
            f"twins pending two consecutive rounds (rotate into _PRIORITY): {sorted(stuck)}"
        )


def test_window_is_full_and_valid():
    """Window entries must be registered queries and fill all 50 slots
    (an under-full window wastes hard-signal capacity)."""
    data = _manifest()
    latest = _round_keys(data)[-1]
    names = data[latest]
    assert len(names) == WINDOW
    assert len(set(names)) == WINDOW
    registered = set(all_queries())
    unknown = [n for n in names if n not in registered]
    assert not unknown, f"manifest names not registered: {unknown}"
