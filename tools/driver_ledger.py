"""Emit the last-driver-checked ledger for docs/DRIVER_WINDOW.md.

r10 verdict item 5: rotation priority must be mechanical.  This script
reads every CORRECTNESS_r*.json (the driver's own records — the only
unfakeable signal) and prints, for each registered query, the LAST round
the driver checked it, grouped by round, oldest first.  The block it
prints is pasted verbatim between the ``<!-- ledger:begin -->`` /
``<!-- ledger:end -->`` markers in docs/DRIVER_WINDOW.md;
tests/test_registry_invariants.py::test_ledger_matches_correctness_files
regenerates it and diffs, so the doc cannot drift from the files.

Usage:  python tools/driver_ledger.py
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def tracked_correctness_files() -> list[Path]:
    """The CORRECTNESS_r*.json files tracked in git HEAD — NOT a bare
    glob.  The driver writes CORRECTNESS_r{N}.json AFTER the round's
    final commit, so a glob-based ledger can never match the committed
    doc (the r11–r13 structural one-red-test: the builder cannot commit
    a file that does not exist yet).  Restricting to tracked files makes
    the committed ledger self-consistent on the judged tree; the next
    round's opening commit `git add`s the driver artifact and
    regenerates, folding it in.  Falls back to the glob outside a git
    checkout."""
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return sorted(REPO.glob("CORRECTNESS_r*.json"))
    return sorted(REPO / name for name in out)


def last_checked() -> dict[str, int | None]:
    """Map every registered query name to the last round a git-tracked
    CORRECTNESS_r*.json recorded it (None = never driver-checked).
    Registration order is preserved so per-round listings are stable."""
    import sys

    if str(REPO) not in sys.path:
        sys.path.insert(0, str(REPO))
    import npm_mirror_spark.queries as q

    last: dict[str, int | None] = {name: None for name in q.QUERIES}
    for f in tracked_correctness_files():
        rnd = int(re.search(r"_r(\d+)\.json$", f.name).group(1))
        for name in json.load(f.open()):
            if name in last:
                last[name] = max(last[name] or 0, rnd)
    return last


def render(last: dict[str, int | None]) -> str:
    """The markdown ledger block: one bullet per last-checked round,
    oldest (= highest rotation priority) first, never-checked at top."""
    by_round: dict[int | None, list[str]] = {}
    for name, rnd in last.items():
        by_round.setdefault(rnd, []).append(name)
    lines = ["| last driver check | n | queries (registration order) |",
             "|---|---|---|"]
    order = sorted((r for r in by_round if r is not None))
    if None in by_round:
        names = " ".join(f"`{n}`" for n in by_round[None])
        lines.append(f"| never | {len(by_round[None])} | {names} |")
    for rnd in order:
        names = " ".join(f"`{n}`" for n in by_round[rnd])
        lines.append(f"| r{rnd:02d} | {len(by_round[rnd])} | {names} |")
    return "\n".join(lines)


if __name__ == "__main__":
    print(render(last_checked()))
