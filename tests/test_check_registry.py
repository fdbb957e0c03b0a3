"""scripts/check_registry.py gate: the freshness invariant must hold
on the real registry + history, fail on synthetic stale fixtures, and
emit a priority list that leads with no-row / red / oldest entries."""

import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)

import check_registry as cr  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _names(n):
    return [f"q{i:03d}" for i in range(n)]


def _tracked_correctness_paths():
    """CORRECTNESS files known to git — the state the registry was last
    rotated against. An UNTRACKED file is the driver's just-dropped
    in-progress round; the registry is rotated for it in the same session
    that commits it, so the pytest gate must not go red merely because
    the driver ran (scripts/check_registry.py stays the strict
    pre-commit gate over ALL files)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        )
        if out.returncode == 0:
            return [os.path.join(REPO, f) for f in out.stdout.split()]
    except Exception:
        pass
    return None


def test_real_registry_holds():
    import __spark_entry__ as entry

    all_paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not all_paths:
        pytest.skip("no driver CORRECTNESS files")
    tracked = _tracked_correctness_paths()
    paths = tracked if tracked else all_paths

    def run(ps):
        last = cr.load_history(ps)
        max_round = max(
            int(os.path.basename(p).split("r")[1].split(".")[0]) for p in ps
        )
        return cr.check(list(entry.queries()), last, max_round)

    violations, nxt = run(paths)
    assert violations == [], violations
    assert len(nxt) == cr.WINDOW

    # Informative (not suite-red) check over the in-progress round, if any.
    untracked = sorted(set(all_paths) - set(paths))
    if untracked:
        all_violations, _ = run(all_paths)
        if all_violations:
            pytest.xfail(
                "in-progress driver round needs a registry rotation "
                f"(queries to lead the next window): {all_violations}"
            )


def test_no_row_outside_window_fails():
    names = _names(60)
    # every query green last round except the last one, which has no row
    last = {n: (7, True) for n in names[:-1]}
    violations, _ = cr.check(names, last, 7)
    assert len(violations) == 1 and "NO driver row" in violations[0]


def test_red_row_outside_window_fails():
    names = _names(60)
    last = {n: (7, True) for n in names}
    last[names[55]] = (7, False)
    violations, _ = cr.check(names, last, 7)
    assert len(violations) == 1 and "RED" in violations[0]


def test_stale_tail_fails_at_lookback():
    # 118 queries -> lookback 3. A tail row from r05 goes stale before
    # its next scheduled refresh once r08 runs (union r07..r09 misses it).
    names = _names(118)
    last = {n: (7, True) for n in names}
    last[names[100]] = (5, True)
    violations, _ = cr.check(names, last, 7)
    assert len(violations) == 1 and "stale" in violations[0]
    # the same r05 row INSIDE the window is fine — it is about to refresh
    last2 = {n: (7, True) for n in names}
    last2[names[3]] = (5, True)
    violations2, _ = cr.check(names, last2, 7)
    assert violations2 == []


def test_priority_leads_with_norow_then_red_then_oldest():
    names = _names(118)
    last = {n: (7, True) for n in names}
    del last[names[117]]          # no row ever
    last[names[116]] = (7, False)  # red
    last[names[115]] = (6, True)   # oldest green
    _, nxt = cr.check(names, last, 7)
    assert nxt[0] == names[117]
    assert nxt[1] == names[116]
    assert nxt[2] == names[115]
