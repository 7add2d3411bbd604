"""Canary-normalized per-round bench table in SCALING.md (VERDICT r6
ask #8).

Raw walls drift with box load; bench.py's machine-speed canary
(fixed CPU fold + 1M-row hash-agg shuffle, best-of-3) measures the box
each run, so ``query_sec / canary_sec`` is comparable ACROSS rounds.
This tool:

1. archives the current ``BENCH_SUMMARY.json`` (full per-query map +
   canary) as ``bench_history/r{N}.json`` — the summary file is
   overwritten every bench run, so the archive is what makes
   round-over-round diffs possible;
2. regenerates the table between the CANARY-NORM markers in
   SCALING.md: one row per query, one raw + one normalized column per
   archived round.

Usage: ``python tools/canary_table.py [r7]`` — archive under the given
round key (default: skip archiving, just re-render).
"""

from __future__ import annotations

import json
import re
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
HIST = REPO / "bench_history"
MARK_A = "<!-- CANARY-NORM:BEGIN -->"
MARK_B = "<!-- CANARY-NORM:END -->"


def archive(round_key: str) -> None:
    src = REPO / "BENCH_SUMMARY.json"
    if not src.exists():
        sys.exit("BENCH_SUMMARY.json missing — run bench.py first")
    data = json.loads(src.read_text())
    if not data.get("complete"):
        sys.exit("refusing to archive an incomplete bench summary")
    HIST.mkdir(exist_ok=True)
    shutil.copy(src, HIST / f"{round_key}.json")
    print(f"archived BENCH_SUMMARY.json -> bench_history/{round_key}.json")


def render() -> str:
    rounds = sorted(
        HIST.glob("r*.json"),
        key=lambda p: int(re.sub(r"\D", "", p.stem)),
    )
    if not rounds:
        sys.exit("no bench_history/r*.json archives")
    data = {p.stem: json.loads(p.read_text()) for p in rounds}
    names: list[str] = []
    for d in data.values():
        for q in d.get("queries", {}):
            if q not in names:
                names.append(q)
    hdr = ["query"]
    for rk in data:
        c = data[rk].get("canary_sec")
        hdr += [f"{rk} raw", f"{rk} /canary({c:.3f}s)"]
    shuf = ", ".join(
        f"{rk}={data[rk]['shuffle_canary_sec']:.3f}s"
        for rk in data
        if data[rk].get("shuffle_canary_sec") is not None
    )
    lines = [
        MARK_A,
        "",
        "Per-round walls at sf0.1, raw and canary-normalized",
        "(query_sec / canary_sec; bench.py run_canary measures the box",
        "each run, so the normalized column is the one to diff across",
        "rounds). Archives live in bench_history/ — BENCH_SUMMARY.json",
        "is overwritten per run, the archive is the history.",
        "The CPU canary misses DISK contention (shuffle writes), which",
        "hit shuffle-heavy queries 2-4x in r8 while CPU-bound ones ran",
        "FASTER; bench.py's second probe records it per archive"
        + (f" (shuffle canary: {shuf})" if shuf else "")
        + ". r8+ runs also pin spark.local.dir to tmpfs"
        " (session.py _scratch_dir), which removes most of that"
        " variance at the source.",
        "",
        "| " + " | ".join(hdr) + " |",
        "|" + "---|" * len(hdr),
    ]
    for q in names:
        row = [q]
        for rk in data:
            sec = data[rk].get("queries", {}).get(q)
            c = data[rk].get("canary_sec") or 1.0
            if sec is None:
                row += ["-", "-"]
            else:
                row += [f"{sec:.2f}s", f"{sec / c:.2f}"]
        lines.append("| " + " | ".join(row) + " |")
    lines += ["", MARK_B]
    return "\n".join(lines)


def splice(block: str) -> None:
    path = REPO / "SCALING.md"
    text = path.read_text()
    if MARK_A in text:
        pre = text[: text.index(MARK_A)]
        post = text[text.index(MARK_B) + len(MARK_B) :]
        path.write_text(pre + block + post)
    else:
        path.write_text(
            text.rstrip()
            + "\n\n## Canary-normalized walls per round (sf0.1)\n\n"
            + block
            + "\n"
        )
    print("SCALING.md canary table updated")


if __name__ == "__main__":
    key = next((a for a in sys.argv[1:] if re.fullmatch(r"r\d+", a)), None)
    if key:
        archive(key)
    splice(render())
