"""bench.py driver contract: ONE JSON line on stdout with per-query times
for the primary SF and a secondary-SF pass for regression attribution."""

import glob
import json
import os
import subprocess
import sys


def test_bench_json_contract_with_secondary_sf():
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_SECONDARY_SF_DIR": "/root/testdata/sf0.01",
            "SPARK_GRAFT_CPUS": "8",
        }
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got {len(lines)}"
    out = json.loads(lines[0])
    assert out["metric"] == "headline_queries_total"
    assert out["unit"] == "sec"
    assert out["value"] > 0
    assert out["sf"] == 0.001
    assert len(out["queries"]) >= 30
    # secondary pass present with the same query set
    assert out["secondary_sf"] == 0.01
    assert out["secondary_total"] > 0
    assert set(out["queries_secondary"]) == set(out["queries"])

    # soft non-regression vs the last driver-recorded bench at the SAME sf
    # (ambient variance on this VM is ±2-3x, so the gate is coarse)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    if prior:
        last = json.loads(open(prior[-1]).read())
        if last.get("sf") == out["sf"] and last.get("value"):
            assert out["value"] <= 3 * last["value"], (
                f"headline total {out['value']}s regressed >3x vs "
                f"{prior[-1]} ({last['value']}s)"
            )
