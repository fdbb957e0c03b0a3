#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from vectordbindexing_spark.session import get_spark

    spark = get_spark(app_name="vdbi-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm up JVM codegen + Python workers so the first query's time is the
    # query, not session bring-up
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # one partition per core so every Python worker is spawned before timing
    spark.range(0, cpus * 4, 1, cpus).selectExpr(
        "id as i", "array(cast(id as float)) as v"
    ).mapInPandas(lambda it: it, schema="i long, v array<float>").count()
    # touch every table once: file listing + footer/schema caches, so the
    # first query over each table measures the query, not cold metadata IO
    from vectordbindexing_spark.io.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    qtimes: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # force full execution
        qtimes[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {qtimes[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(qtimes.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
