#!/usr/bin/env python
"""Count Spark jobs + wall time per phase of the two streaming contract
queries (init / upsert batches), replicating __spark_entry__'s slices at
the given SF — the r13 "jobs-per-upsert halved" evidence (VERDICT #1).

Usage: python scripts/count_upsert_jobs.py [--sf DIR] [--cpus N]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vectordbindexing_spark.io.tables import load_table
    from vectordbindexing_spark.session import get_spark

    spark = get_spark(app_name="count-upsert-jobs", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(0, args.cpus * 4, 1, args.cpus).selectExpr(
        "id as i", "array(cast(id as float)) as v"
    ).mapInPandas(lambda it: it, schema="i long, v array<float>").count()
    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup(None))

    def phase(name: str, fn) -> dict:
        j0, t0 = njobs(), time.perf_counter()
        out = fn()
        rec = {
            "phase": name,
            "jobs": njobs() - j0,
            "sec": round(time.perf_counter() - t0, 2),
        }
        print(json.dumps(rec))
        return out

    # ---- graph maintainer (the _streaming_graph_upsert slices) ----
    from vectordbindexing_spark.streaming.graph_ingest import (
        init_graph_artifact,
        upsert_graph_artifact,
    )

    emb = load_table(spark, args.sf, "embeddings").select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").alias("vec"),
    )
    sli = emb.where(F.col("id") < 160)
    base = sli.where(F.col("id") % 8 != 0)
    ins1 = sli.where(F.col("id") % 8 == 0)
    upd = base.where(F.col("id") % 17 == 1).select(
        "id", F.transform("vec", lambda x: -x).alias("vec")
    )
    b2 = emb.where((F.col("id") >= 160) & (F.col("id") < 200))
    art = tempfile.mkdtemp(prefix="cuj_g_")
    try:
        phase("graph_init", lambda: init_graph_artifact(
            base, art, M0=8, M1=4, buckets=8))
        phase("graph_upsert1", lambda: upsert_graph_artifact(
            ins1.unionByName(upd), art, refresh_factor=10.0))
        phase("graph_upsert2_rebuild", lambda: upsert_graph_artifact(
            b2, art, refresh_factor=1.0))
    finally:
        shutil.rmtree(art, ignore_errors=True)

    # ---- neardup maintainer (the _streaming_neardup_upsert slices) ----
    from vectordbindexing_spark.streaming.neardup import (
        init_neardup_artifact,
        upsert_neardup_artifact,
    )

    docs = load_table(spark, args.sf, "documents").select("doc_id", "text")
    nbase = docs.where(F.col("doc_id") % 4 != 0)
    nb1 = docs.where(F.col("doc_id") % 8 == 0)
    nb2 = docs.where(F.col("doc_id") % 8 == 4)
    nart = tempfile.mkdtemp(prefix="cuj_n_")
    try:
        phase("neardup_init", lambda: init_neardup_artifact(
            nbase, nart, buckets=64))
        p1 = phase("neardup_upsert1", lambda: upsert_neardup_artifact(
            nb1, nart))
        phase("neardup_pairs1_count", lambda: p1.count())
        p2 = phase("neardup_upsert2", lambda: upsert_neardup_artifact(
            nb2, nart))
        phase("neardup_pairs2_count", lambda: p2.count())
    finally:
        shutil.rmtree(nart, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
