#!/usr/bin/env python
"""Spark job count + wall time for declared entry queries — evidence
for job-fold optimizations whose returned-frame plan shape cannot show
the change (e.g. lazy vs eager per-round checkpoints: both plan as a
local scan; what changes is how many fixed-latency jobs run).

Usage: python scripts/count_query_jobs.py QUERY [QUERY ...]
       [--sf DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from vectordbindexing_spark.session import get_spark

    spark = get_spark(app_name="count-query-jobs", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(0, args.cpus * 4, 1, args.cpus).selectExpr(
        "id as i", "array(cast(id as float)) as v"
    ).mapInPandas(lambda it: it, schema="i long, v array<float>").count()
    tracker = spark.sparkContext.statusTracker()
    qs = entrymod.queries()
    for name in args.queries:
        j0 = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        n = qs[name](spark, args.sf).count()
        rec = {
            "query": name,
            "jobs": len(tracker.getJobIdsForGroup(None)) - j0,
            "sec": round(time.perf_counter() - t0, 2),
            "rows": n,
        }
        print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
