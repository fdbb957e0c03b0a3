#!/usr/bin/env python
"""Isolated per-query measurement + plan capture for the optimization
rounds: builds ONE declared query on a fresh warmed session (the bench's
session recipe), times construction + the count action (the bench's
timed action) for N trials, and optionally writes the final DataFrame's
``explain("formatted")`` output to a file (the plans/r12 evidence the
judge checks).

Usage:
  python scripts/time_query.py QUERY [--sf DIR] [--trials N]
                               [--plan-out FILE] [--cpus N]

Timing methodology matches bench.py exactly (fn(spark, sf_dir) then
.count(), gc between trials) so numbers are comparable to the recorded
bench lines; the first trial is "cold in this session", later trials
are warm.
"""

from __future__ import annotations

import argparse
import contextlib
import gc
import io
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plan-out", default=None)
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    import __spark_entry__ as entrymod
    from vectordbindexing_spark.session import get_spark

    spark = get_spark(app_name=f"time-{args.query}", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # the bench's warm-up: codegen + a python worker per core + tables
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(0, args.cpus * 4, 1, args.cpus).selectExpr(
        "id as i", "array(cast(id as float)) as v"
    ).mapInPandas(lambda it: it, schema="i long, v array<float>").count()
    import bench

    bench._warm_tables(spark, args.sf)

    fn = entrymod.queries()[args.query]
    for t in range(args.trials):
        spark.sparkContext.setJobDescription(f"{args.query} trial {t}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        t_build = time.perf_counter() - t0
        n = df.count()
        t_all = time.perf_counter() - t0
        print(
            f"trial {t}: total={t_all:.3f}s build={t_build:.3f}s "
            f"count={t_all - t_build:.3f}s rows={n}",
            flush=True,
        )
        if args.plan_out and t == 0:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(args.plan_out, "w") as f:
                f.write(buf.getvalue())
        del df
        gc.collect()
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
