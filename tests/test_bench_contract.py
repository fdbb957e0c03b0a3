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
    # no query may error at test SFs (fault isolation is for the driver
    # run, not a license to ship broken queries)
    assert "errors" not in out, out.get("errors")
    # secondary pass: two scalars inline, full per-query map on stderr
    # (keeps the stdout line under the driver's ~2 KB tail buffer)
    assert out["secondary_sf"] == 0.01
    assert out["secondary_total"] > 0
    assert "queries_secondary" not in out
    sec_lines = [
        ln for ln in proc.stderr.splitlines() if ln.startswith("# secondary ")
    ]
    assert len(sec_lines) == 1
    sec = json.loads(sec_lines[0][len("# secondary "):])
    assert sec["errors_secondary"] == []
    if "queries_truncated" in out:
        # past ~72 queries the per-query map no longer fits the stdout
        # budget even at one decimal; bench degrades by dropping the
        # SMALLEST entries and flagging the count — the FULL map must
        # then be on stderr ("# full"), and nothing big may be missing
        full_lines = [
            ln for ln in proc.stderr.splitlines() if ln.startswith("# full ")
        ]
        assert len(full_lines) == 1
        full = json.loads(full_lines[0][len("# full "):])
        assert set(full["queries"]) == set(sec["queries_secondary"])
        assert out["queries_truncated"] == len(full["queries"]) - len(
            out["queries"]
        )
        dropped = set(full["queries"]) - set(out["queries"])
        # the degrade loop drops the SMALLEST entries first — at 122
        # registered queries on a slow box the dropped tail can
        # legitimately exceed an absolute threshold, so pin the
        # ordering invariant instead (0.1 tolerance: the sort ran on
        # 1-decimal rounded values, full carries 3 decimals)
        kept_full = [full["queries"][q] for q in out["queries"]]
        assert max(full["queries"][q] for q in dropped) <= min(
            kept_full
        ) + 0.1, dropped
    else:
        assert set(sec["queries_secondary"]) == set(out["queries"])
    # the stdout contract line itself must fit the driver's tail buffer
    assert len(lines[0]) < 2000, f"stdout JSON line {len(lines[0])}B >= 2KB"

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
