"""Measure the streaming graph-artifact upsert at scale (SCALE.md log).

Replicates the r09 measurement shape — 500k x d=64, M0=16, 4096
buckets on local[32] — so rounds are comparable: init bulk build, a
fresh-insert micro-batch at two sizes, an UPDATE micro-batch (existing
ids, new vectors — exercises the replaced-id losers probe that now
prunes on the dst-bucketed ``rev_edges`` mirror), and a replay no-op.
Prints one JSON line per step.

Usage:
    python scripts/measure_upsert.py [--n 500000] [--dim 64]
        [--batches 100,1000] [--buckets 4096] [--workdir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batches", default="100,1000")
    ap.add_argument("--buckets", type=int, default=4096)
    ap.add_argument("--m0", type=int, default=16)
    ap.add_argument("--m1", type=int, default=8)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--workdir", default=None)
    ap.add_argument(
        "--exact-limit", type=int, default=None,
        help="exact_base_limit forwarded to init + every upsert "
        "(force the maintained-IVF-artifact route below 2M corpora)",
    )
    ap.add_argument(
        "--reuse", action="store_true",
        help="skip the init bulk build when --workdir already holds an "
        "artifact (meta.json present) — amortize the 2M init across "
        "measurement reruns",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("measure_upsert")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vectordbindexing_spark.io.synthetic import synthetic_vectors
    from vectordbindexing_spark.streaming.graph_ingest import (
        init_graph_artifact,
        upsert_graph_artifact,
    )

    work = args.workdir or tempfile.mkdtemp(prefix="upsert_bench_")
    idx = f"{work}/graph_idx"

    def emit(step: str, sec: float, **kw) -> None:
        print(json.dumps({"step": step, "sec": round(sec, 1), **kw}),
              flush=True)

    import glob as _glob

    def _snap(sub: str) -> dict:
        return {
            f: (os.path.getmtime(f), os.path.getsize(f))
            for f in _glob.glob(
                os.path.join(idx, sub, "**", "*.parquet"), recursive=True
            )
        }

    def _rewritten(before: dict, after: dict) -> int:
        return sum(
            sz for f, (mt, sz) in after.items()
            if f not in before or before[f][0] != mt
        )

    base = synthetic_vectors(
        spark, args.n, args.dim, n_modalities=64, seed=7
    ).select("id", "vec")
    if args.reuse and os.path.exists(os.path.join(idx, "meta.json")):
        emit("init", 0.0, n=args.n, reused=True)
    else:
        t0 = time.time()
        init_graph_artifact(
            base, idx, M0=args.m0, M1=args.m1, buckets=args.buckets,
            exact_base_limit=args.exact_limit,
        )
        emit("init", time.time() - t0, n=args.n, dim=args.dim,
             buckets=args.buckets)

    next_id = args.n
    for bs in [int(b) for b in args.batches.split(",")]:
        batch = synthetic_vectors(
            spark, bs, args.dim, n_modalities=64, seed=7,
            noise_seed=900 + bs,
        ).selectExpr(f"id + {next_id} as id", "vec")
        next_id += bs
        t0 = time.time()
        out = upsert_graph_artifact(
            batch, idx, exact_base_limit=args.exact_limit
        )
        emit(f"fresh_batch_{bs}", time.time() - t0, result=out)

    # UPDATE: existing ids, shifted vectors — stale-edge drop + losers
    # probe + dirty-dst candidate scan all on the rev_edges prune path.
    # Bytes-rewritten accounting per artifact (the LSM contract: only
    # vectors swap dirty buckets; edges/rev/ivf are append-only logs).
    upd = synthetic_vectors(
        spark, 1000, args.dim, n_modalities=64, seed=7, noise_seed=1717
    ).selectExpr(f"id * 137 % {args.n} as id", "vec").dropDuplicates(["id"])
    snaps = {
        s: _snap(s) for s in ("vectors", "edges", "rev_edges", "ivf_cells")
    }
    t0 = time.time()
    out = upsert_graph_artifact(upd, idx, exact_base_limit=args.exact_limit)
    sec = time.time() - t0
    rewritten = {
        s: _rewritten(before, _snap(s)) for s, before in snaps.items()
    }
    appended = {
        s: sum(sz for _, sz in _snap(s).values())
        for s in ("fwd_delta", "rev_delta", "ivf_delta")
    }
    emit("update_batch_1000", sec, result=out,
         bytes_rewritten=rewritten, delta_bytes_total=appended)

    t0 = time.time()
    out = upsert_graph_artifact(upd, idx, exact_base_limit=args.exact_limit)
    emit("replay_noop", time.time() - t0, result=out)

    if args.workdir is None:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
