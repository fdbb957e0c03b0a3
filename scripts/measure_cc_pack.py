#!/usr/bin/env python
"""Measured scale runs for connected_components (1M edges) and
pack_token_windows (1M docs) — SCALE.md protocol: quiet box, local[32],
deterministic JVM-side data generation (no driver materialization).

Usage: python scripts/measure_cc_pack.py [--cpus 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "64g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- connected components: 1M edges over 500k nodes --------------
    # structure chosen to stress the star algorithm both ways:
    #  - a 100k-node CHAIN (depth pathology: naive propagation needs
    #    100k rounds; large-star/small-star needs O(log n))
    #  - 400k nodes in 4k random 100-node clusters (breadth pathology)
    from vectordbindexing_spark.operators.components import (
        connected_components,
    )

    chain = spark.range(0, 100_000 - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    # deterministic pseudo-random intra-cluster edges: node u in
    # [100k, 500k); cluster c = (u-100k)/100; partner = c*100 +
    # (u*2654435761 mod 100) — ~900k edges
    rnd = spark.range(100_000, 500_000).select(
        F.col("id").alias("src"),
        (
            (F.floor((F.col("id") - 100_000) / 100) * 100 + 100_000)
            + F.pmod(F.col("id") * F.lit(2654435761), F.lit(100))
        ).alias("dst"),
    )
    more = spark.range(100_000, 500_000).select(
        F.col("id").alias("src"),
        (
            (F.floor((F.col("id") - 100_000) / 100) * 100 + 100_000)
            + F.pmod(F.col("id") * F.lit(40503) + 7, F.lit(100))
        ).alias("dst"),
    )
    edges = chain.unionByName(rnd).unionByName(more).filter(
        F.col("src") != F.col("dst")
    )
    n_edges = edges.count()
    t0 = time.time()
    comp = connected_components(edges, id_a="src", id_b="dst", max_rounds=40)
    ncomp = comp.select("component").distinct().count()
    t_cc = time.time() - t0
    print(
        f"CC: {n_edges} edges, {ncomp} components, {t_cc:.1f}s "
        f"(chain depth 100k + 4k clusters)"
    )

    # ---- pack_token_windows: 1M docs ---------------------------------
    from vectordbindexing_spark.operators.textops import pack_token_windows

    docs = spark.range(0, 1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), (F.pmod("id", F.lit(50)) + 10)),
                lambda i: F.concat(F.lit("tok"), i),
            ),
        ).alias("text"),
    )
    t0 = time.time()
    packed = pack_token_windows(docs, seq_len=2048, n_shards=32)
    stats = packed.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("tok_end") - F.col("tok_start")).alias("toks"),
    ).collect()[0]
    t_pk = time.time() - t0
    print(
        f"pack: 1M docs -> {stats['rows']} rows, {stats['toks']} tokens, "
        f"{t_pk:.1f}s (seq_len=2048, 32 shards)"
    )


if __name__ == "__main__":
    main()
