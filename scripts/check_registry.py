"""Registry-window invariant check (run before every commit that
touches queries()).

The driver's per-round CORRECTNESS file covers roughly the FIRST 50
registry entries. Every entry past position 50 must therefore have a
green row in its MOST RECENT driver check — otherwise it would reach
the judge with no (or a red) driver row. With ≤100 registry entries
that means "green in the previous round's file"; past 100 the window
cycles every ⌈N/50⌉ rounds, so the check accepts the union of the
last two rounds' green sets (each session's local full replay —
tests/test_entry_contract.py — still exercises EVERY query). New or
changed queries must sit inside the window.

Usage: python scripts/check_registry.py [CORRECTNESS_rNN.json ...]
(defaults to the two highest-numbered CORRECTNESS files in the repo
root). Exits non-zero on violation.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
LOOKBACK = 2


def _green(path: str) -> set[str]:
    prev = json.load(open(path))
    return {
        k
        for k, v in prev.items()
        if isinstance(v, dict)
        and v.get("rows_match")
        and v.get("schema_match")
        and v.get("hash_match", True)
    }


def main() -> int:
    import __spark_entry__ as entry

    if len(sys.argv) > 1:
        paths = sys.argv[1:]
    else:
        files = glob.glob("CORRECTNESS_r*.json")
        if not files:
            print("no CORRECTNESS file found")
            return 2
        files.sort(key=lambda f: int(re.search(r"r(\d+)", f).group(1)))
        paths = files[-LOOKBACK:]
    green: set[str] = set()
    for p in paths:
        green |= _green(p)
    names = list(entry.queries())
    bad = [n for n in names[WINDOW:] if n not in green]
    slack = WINDOW - sum(1 for n in names[:WINDOW] if n not in green)
    print(f"{len(names)} queries; window slack {slack}; "
          f"vs {' + '.join(paths)}")
    if bad:
        print(f"VIOLATION — tail entries with no recent green row: {bad}")
        return 1
    print("invariant holds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
