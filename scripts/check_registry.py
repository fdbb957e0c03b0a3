"""Registry-window freshness check (run before every commit that
touches queries()).

The driver's per-round CORRECTNESS file covers roughly the FIRST 50
registry entries, so with N registered queries the window cycles every
ceil(N/50) rounds — that is the maximum tolerable age of any query's
most recent green driver row. This script enforces, against the full
CORRECTNESS_r*.json history:

1. Every registered query either has a green row recent enough to
   survive until its next scheduled refresh (row round >= R+1-lookback
   where R is the upcoming round and lookback = ceil(N/50)), or sits
   inside the current first-50 window (about to get a row — this is
   where new registrations and stale entries MUST go).
2. No query has a red most-recent row outside the window (a red row
   must be led back into the window for a re-check, never parked).

It also emits the NEXT round's window priority list (oldest rows
first) so rotation stays mechanical as the registry grows. Every
session's local full replay (tests/test_entry_contract.py) still
exercises ALL queries regardless of window position.

Usage: python scripts/check_registry.py [CORRECTNESS_rNN.json ...]
(defaults to every CORRECTNESS file in the repo root). Exits non-zero
on violation.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def _row_green(v: object) -> bool:
    return (
        isinstance(v, dict)
        and bool(v.get("rows_match"))
        and bool(v.get("schema_match"))
        and bool(v.get("hash_match", True))
    )


def load_history(paths: list[str]) -> dict[str, tuple[int, bool]]:
    """query -> (round of most recent driver row, was it green)."""
    last: dict[str, tuple[int, bool]] = {}
    for p in sorted(paths, key=lambda f: int(re.search(r"r(\d+)", f).group(1))):
        rnd = int(re.search(r"r(\d+)", p).group(1))
        for k, v in json.load(open(p)).items():
            last[k] = (rnd, _row_green(v))
    return last


def check(names: list[str], last: dict[str, tuple[int, bool]],
          max_round: int) -> tuple[list[str], list[str]]:
    """Returns (violations, next_window_priority)."""
    lookback = max(2, math.ceil(len(names) / WINDOW))
    upcoming = max_round + 1           # the round the driver runs next
    min_ok = upcoming + 1 - lookback   # oldest row that survives r(upcoming+1)
    window = set(names[:WINDOW])
    violations: list[str] = []
    for n in names:
        rnd_green = last.get(n)
        if n in window:
            continue  # about to be refreshed by the upcoming driver run
        if rnd_green is None:
            violations.append(f"{n}: NO driver row ever, outside the window")
        elif not rnd_green[1]:
            violations.append(
                f"{n}: most recent driver row (r{rnd_green[0]}) is RED, "
                "outside the window"
            )
        elif rnd_green[0] < min_ok:
            violations.append(
                f"{n}: last green row r{rnd_green[0]} < r{min_ok} "
                f"(lookback {lookback}) — would go stale before its next "
                "scheduled refresh; lead the window with it"
            )
    # next-window priority: no-row first, then reds, then oldest greens.
    # Entries in the CURRENT window are about to get a fresh r(upcoming)
    # row, so they sort last.
    def prio(n: str) -> tuple:
        if n in window:
            return (3, upcoming, n)
        rg = last.get(n)
        if rg is None:
            return (0, 0, n)
        if not rg[1]:
            return (1, rg[0], n)
        return (2, rg[0], n)

    nxt = sorted(names, key=prio)[:WINDOW]
    return violations, nxt


def main() -> int:
    import __spark_entry__ as entry

    paths = sys.argv[1:] or glob.glob("CORRECTNESS_r*.json")
    if not paths:
        print("no CORRECTNESS file found")
        return 2
    last = load_history(paths)
    max_round = max(
        int(re.search(r"r(\d+)", p).group(1)) for p in paths
    )
    names = list(entry.queries())
    lookback = max(2, math.ceil(len(names) / WINDOW))
    violations, nxt = check(names, last, max_round)
    in_window_stale = [
        n for n in names[:WINDOW]
        if last.get(n) is None or not last[n][1]
        or last[n][0] <= max_round - lookback
    ]
    print(
        f"{len(names)} queries; window {WINDOW}; lookback {lookback} "
        f"rounds; history through r{max_round:02d}; window entries "
        f"needing the upcoming row: {len(in_window_stale)}"
    )
    if violations:
        print("VIOLATIONS:")
        for v in violations:
            print(f"  {v}")
        return 1
    print("invariant holds")
    print("next-window priority (oldest rows first):")
    for n in nxt:
        rg = last.get(n)
        tag = "none" if rg is None else ("r%02d%s" % (rg[0], "" if rg[1] else " RED"))
        print(f"  {n} [{tag}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
