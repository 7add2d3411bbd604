"""Regenerate the current round's entry in checked_rounds.json.

The driver's correctness gate checks only the FIRST 50 entries of
``__spark_entry__.queries()``, so which operators get a hard driver
signal is decided by ``registry._PRIORITY`` ordering. To make window
rotation a mechanical invariant instead of a per-round judgement call,
this manifest records the checked window of every committed round;
``tests/test_rotation.py`` fails the build if any oracle twin would go
``CADENCE`` (5 as of round 7) consecutive rounds without a driver row.
The cadence moved from 3 to 4 in round 5 when the twin count hit the
3-round capacity ceiling, and from 4 to 5 in round 7 at the 200-twin
ceiling (see tests/test_rotation.py module doc); the per-round
LOCAL_PARITY artifact (tools/local_parity.py) is the compensating
every-round hard signal. DELIBERATE TRADE-OFF (r7 ADVICE sign-off):
each relaxation lowers the independent-driver verification frequency,
so cadence 5 is the LAST widening — if the registry approaches the
250-twin capacity, cap per-round twin registration instead (the
driver's WINDOW=50 is fixed by the grading harness and cannot be
raised from this side).

Usage: ``python tools/update_checked_rounds.py r3`` (run whenever
``_PRIORITY`` changes; the test also verifies the latest entry matches
the live registry so the manifest cannot go stale).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50
CADENCE = 5  # keep in sync with tests/test_rotation.py


def require_prior_artifacts(round_key: str) -> None:
    """Refuse to append round N's window unless round N-1's driver
    CORRECTNESS artifact is tracked in git (r2 VERDICT lost
    CORRECTNESS_r03.json forever because it was never committed).
    The previous round may legitimately have no artifact only if the
    driver never produced one — require an explicit override then."""
    n = int(re.sub(r"\D", "", round_key))
    if n <= 1 or "--force" in sys.argv:
        return
    prev = f"CORRECTNESS_r{n - 1:02d}.json"
    tracked = subprocess.run(
        ["git", "ls-files", "--error-unmatch", prev],
        cwd=REPO,
        capture_output=True,
    )
    if tracked.returncode != 0:
        sys.exit(
            f"REFUSING to record {round_key}: {prev} is not git-tracked. "
            f"`git add {prev} BENCH_r{n - 1:02d}.json` first (driver "
            "artifacts must be committed the moment they land), or pass "
            "--force if the driver genuinely produced none."
        )


def current_window() -> list[str]:
    sys.path.insert(0, str(REPO))
    from big_data_tools_spark.queries import ordered_queries

    return list(ordered_queries())[:WINDOW]


def all_twins() -> list[str]:
    sys.path.insert(0, str(REPO))
    from big_data_tools_spark.queries import all_queries

    return [n for n, s in all_queries().items() if s.sql is not None]


def main(round_key: str) -> None:
    """Besides the window itself, record ``pending_<round>``: oracle
    twins registered this round that did not fit the 50-slot window
    (it can saturate when a round both retires old debt and adds many
    new twins). A pending twin is allowed to wait ONE round;
    tests/test_rotation.py fails if it appears in two consecutive
    pending lists without ever being windowed."""
    require_prior_artifacts(round_key)
    path = REPO / "checked_rounds.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    data[round_key] = current_window()
    windowed_ever = set().union(
        *(v for k, v in data.items() if not k.startswith("pending_"))
    )
    data[f"pending_{round_key}"] = sorted(
        t for t in all_twins() if t not in windowed_ever
    )
    path.write_text(json.dumps(data, indent=1) + "\n")
    print(
        f"{round_key}: {len(data[round_key])} entries written, "
        f"{len(data[f'pending_{round_key}'])} pending"
    )


def plan_next() -> None:
    """Print the twins the NEXT round's window MUST seat: everything
    absent from the last ``CADENCE - 1`` committed windows (the
    CADENCE-round union invariant makes those mandatory once a new
    round is appended) — the pending queue is a subset by
    construction. Run this at round start before editing
    ``_PRIORITY``; free slots go to never-windowed rows-only queries
    (r4 VERDICT ask #4), 2-3 per round."""
    data = json.loads((REPO / "checked_rounds.json").read_text())
    rounds = sorted(
        (k for k in data if not k.startswith("pending_")),
        key=lambda k: int("".join(c for c in k if c.isdigit())),
    )
    recent = set().union(*(data[k] for k in rounds[-(CADENCE - 1):]))
    must = sorted(t for t in all_twins() if t not in recent)
    free = WINDOW - len(must)
    print(f"after {rounds[-1]}: {len(must)} twins MUST be in the next window "
          f"({free} free slots):")
    for t in must:
        print(" ", t)


if __name__ == "__main__":
    if "--plan" in sys.argv:
        plan_next()
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "r3")
