"""Mechanical enforcement of driver-window rotation (r2 VERDICT ask #7).

The driver only hard-checks the first 50 registry entries per round, so
without rotation an oracle twin can pass the local parity suite forever
while never receiving a driver CORRECTNESS row (exactly what happened
to 19 round-2 twins). ``checked_rounds.json`` records each committed
round's window; these tests fail the build if the manifest goes stale
or if any twin would go ``CADENCE`` consecutive rounds unchecked.

Cadence history: rounds 2-5 enforced a 3-round union. At 149 twins
that invariant saturated (50-slot window x 3 rounds = 150-twin
ceiling: round 6 would have had ONE free slot), which froze twin
growth AND made the r4 VERDICT's ask #4 — seating never-windowed
rows-only queries — permanently impossible. Round 5 therefore moved
the hard driver cadence to 4 rounds (capacity 200) and added a
COMPENSATING control with stricter frequency: every round commits a
``LOCAL_PARITY_r{N}.json`` artifact recording a driver-style DuckDB
hash comparison of EVERY twin at sf0.01 (tools/local_parity.py;
enforced tracked + all-green by test_local_parity_artifact below), so
between driver rows each twin still carries a committed, re-runnable
hard signal every single round. Round 7's four operator waves pushed
the twin count past 200 (203 at round end), saturating cadence 4 the
same way (the r8 plan owed 67 mandatory seats for 50 slots), so the
cadence moved to 5 (capacity 250) under the same compensating
LOCAL_PARITY control. Per the r7 ADVICE sign-off: each cadence
relaxation lowers independent-driver verification frequency, so the
NEXT saturation (registry approaching 250 twins) must be resolved by
capping registry growth — not by widening the cadence again.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from big_data_tools_spark.queries import ordered_queries
from big_data_tools_spark.queries.registry import all_queries

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50
CADENCE = 5  # every twin gets a driver row at least once per CADENCE rounds


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


def test_no_twin_unchecked_for_cadence_rounds():
    """Every oracle twin must appear in at least one of the last
    ``CADENCE`` checked windows — except twins REGISTERED this round
    that the saturated 50-slot window could not absorb, which are
    recorded in the current round's ``pending_`` list and may wait
    exactly one round (enforced by test_pending_twins_drain)."""
    data = _manifest()
    keys = _round_keys(data)
    recent = set().union(*(data[k] for k in keys[-CADENCE:]))
    pending_now = set(data.get(f"pending_{keys[-1]}", []))
    twins = [n for n, s in all_queries().items() if s.sql is not None]
    overdue = [t for t in twins if t not in recent and t not in pending_now]
    assert not overdue, (
        f"oracle twins unchecked for {CADENCE}+ rounds "
        f"(rotate into _PRIORITY): {overdue}"
    )


def test_pending_twins_drain():
    """A twin may sit in the pending queue for ONE round only: the
    next round's window must absorb it (pending lists of consecutive
    rounds must be disjoint), and the queue stays small."""
    data = _manifest()
    keys = _round_keys(data)
    cur = set(data.get(f"pending_{keys[-1]}", []))
    # cap raised 10 -> 15 in round 5, 15 -> 20 in round 7 (four
    # operator waves registered 17 twins in one round); at the 5-round
    # cadence the r8 window owes 17 cadence-mandatory re-checks
    # (tools/update_checked_rounds.py --plan), so 20 pending still
    # drain in one round with free seats left for rows-only debt
    assert len(cur) <= 20, f"pending queue too large: {sorted(cur)}"
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


def test_local_parity_artifact():
    """The compensating control for the 4-round driver cadence: the
    latest recorded round must carry a git-TRACKED
    ``LOCAL_PARITY_r{N}.json`` (tools/local_parity.py) in which every
    recorded twin hash-matched DuckDB — the same comparison the
    driver's gate runs, committed so the signal survives lost driver
    artifacts (the CORRECTNESS_r03 lesson). Twins registered after the
    artifact was generated are allowed (regenerate before round end);
    failures are not."""
    import subprocess

    data = _manifest()
    latest = _round_keys(data)[-1]
    n = int(re.sub(r"\D", "", latest))
    path = REPO / f"LOCAL_PARITY_r{n:02d}.json"
    assert path.exists(), (
        f"{path.name} missing — run `python tools/local_parity.py {latest}`"
    )
    tracked = subprocess.run(
        ["git", "ls-files", "--error-unmatch", path.name],
        cwd=REPO,
        capture_output=True,
    )
    assert tracked.returncode == 0, f"{path.name} exists but is not git-tracked"
    doc = json.loads(path.read_text())
    results = doc["results"]
    bad = {k: v for k, v in results.items() if not v.get("ok")}
    assert not bad, f"local parity failures recorded: {sorted(bad)}"
    # every twin known at generation time must be covered
    assert doc["n_twins_at_generation"] == len(results)
