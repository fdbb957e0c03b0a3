"""Single-node serving measurement harness (SCALE.md measured-serving log).

Builds a two-layer graph index over a seeded synthetic corpus, then
sweeps ef over the compact broadcast-serving route, reporting QPS and
recall@k against the exact brute-force baseline — the protocol behind
the SCALE.md "Measured single-node serving" tables (r06: 100k corpus;
r07: 500k, matching the published FAISS-HNSW anchor's corpus size).

Usage:
    python scripts/measure_serving.py --n 500000 --dim 128 \
        --n-queries 2000 --ef 64,128,256,512
Prints one line per stage/ef point; safe to run in the background.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--n-queries", type=int, default=2_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--modalities", type=int, default=2,
                    help="cluster count: 2 = the distance-concentration "
                         "worst case, 64 ≈ realistic embedding diversity")
    ap.add_argument("--ef", type=str, default="64,128,256,512")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--heuristic", action="store_true")
    ap.add_argument("--build-impl", type=str, default="auto",
                    help="auto | blocked | bucketed | lsh")
    ap.add_argument("--tie-audit", action="store_true",
                    help="adjudicate an id-recall plateau: also report "
                         "epsilon-DISTANCE recall (a returned id counts "
                         "when its exact dist is within eps of the GT "
                         "k-th dist) and the near-tie-class id-recall "
                         "ceiling computed from the exact top-100")
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

    from vectordbindexing_spark.io.synthetic import (
        synthetic_queries,
        synthetic_vectors,
    )
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import build_two_layer_index
    from vectordbindexing_spark.operators.search import (
        compact_index,
        graph_search,
    )

    t0 = time.perf_counter()
    base = synthetic_vectors(
        spark, args.n, args.dim, n_modalities=args.modalities
    ).select("id", "vec").localCheckpoint(eager=True)
    q = synthetic_queries(
        spark, args.n_queries, args.dim, n_modalities=args.modalities
    ).select("qid", "vec").localCheckpoint(eager=True)
    log(f"generated corpus n={args.n} d={args.dim} nq={args.n_queries} "
        f"in {time.perf_counter() - t0:.1f}s")

    def to_arrays(df, col):
        return df.groupBy("qid").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("nbr_rank", "neighbor_id"))
                ),
                lambda s: s["neighbor_id"],
            ).alias(col)
        )

    t0 = time.perf_counter()
    k_gt = 100 if args.tie_audit else args.k
    gt_full = exact_knn(q, base, k_gt, "cosine").localCheckpoint(eager=True)
    gt = to_arrays(
        gt_full.where(F.col("nbr_rank") <= args.k), "gt_ids"
    ).localCheckpoint(eager=True)
    exact_wall = time.perf_counter() - t0
    log(f"exact baseline: {exact_wall:.1f}s "
        f"({args.n_queries / exact_wall:.0f} QPS brute force)")

    tie_stats = None
    if args.tie_audit:
        # per-query k-th GT distance and the near-tie class around it:
        # T = #(top-100 dists within eps of d_k), m = #(GT top-k inside
        # the class). A searcher that reaches the class but picks any m
        # of its T members uniformly has id-recall ceiling
        # (k - m + m^2/T) / k — if the measured plateau matches this,
        # the plateau is corpus-intrinsic, not a traversal defect.
        dk = gt_full.where(F.col("nbr_rank") == args.k).select(
            "qid", F.col("dist").alias("_dk")
        )
        eps = F.col("_dk") * 1e-6 + F.lit(1e-12)
        j = gt_full.join(dk, "qid")
        tie_stats = (
            j.groupBy("qid", "_dk")
            .agg(
                F.sum(
                    F.when(
                        F.abs(F.col("dist") - F.col("_dk")) <= eps, 1
                    ).otherwise(0)
                ).alias("T_near"),
                F.sum(
                    F.when(
                        (F.col("nbr_rank") <= args.k)
                        & (F.abs(F.col("dist") - F.col("_dk")) <= eps),
                        1,
                    ).otherwise(0)
                ).alias("m_in_gt"),
            )
            .select(
                "qid", "_dk", "T_near", "m_in_gt",
                (
                    (
                        F.lit(args.k) - F.col("m_in_gt")
                        + F.col("m_in_gt") * F.col("m_in_gt")
                        / F.col("T_near")
                    )
                    / F.lit(float(args.k))
                ).alias("ceiling"),
            )
            .localCheckpoint(eager=True)
        )
        s = tie_stats.agg(
            F.avg("T_near"), F.expr("percentile(T_near, 0.5)"),
            F.max("T_near"), F.avg("m_in_gt"), F.avg("ceiling"),
        ).first()
        log(
            f"tie audit (eps=1e-6 rel): tie-class size mean={s[0]:.1f} "
            f"median={s[1]:.0f} max={s[2]} (top-100-capped); GT members "
            f"in class mean={s[3]:.1f}; uniform-pick id-recall ceiling "
            f"mean={s[4]:.3f}"
        )

    t0 = time.perf_counter()
    edges = build_two_layer_index(
        base, heuristic=args.heuristic, impl=args.build_impl
    ).localCheckpoint(eager=True)
    build_wall = time.perf_counter() - t0
    log(f"two-layer build: {build_wall:.1f}s ({edges.count()} edges)")

    t0 = time.perf_counter()
    idx = compact_index(edges, base)
    log(f"compact collect: {time.perf_counter() - t0:.1f}s")

    for ef in [int(x) for x in args.ef.split(",")]:
        t0 = time.perf_counter()
        got = graph_search(q, idx, k=args.k, ef_search=ef).localCheckpoint(
            eager=True
        )
        wall = time.perf_counter() - t0
        pred = to_arrays(got, "pred_ids")
        rec = (
            pred.join(gt, "qid")
            .select(
                (
                    F.size(F.array_intersect("pred_ids", "gt_ids"))
                    / float(args.k)
                ).alias("r")
            )
            .agg(F.avg("r"))
            .first()[0]
        )
        msg = (
            f"ef={ef}: {wall:.2f}s = {args.n_queries / wall:.0f} QPS "
            f"({1000 * wall / args.n_queries:.2f} ms/q), "
            f"recall@{args.k}={rec:.3f}"
        )
        if tie_stats is not None:
            # epsilon-DISTANCE recall: a returned id counts when its
            # exact distance is within eps of the GT k-th distance —
            # near-tie substitutes are correct answers geometrically
            eps_rec = (
                got.join(tie_stats.select("qid", "_dk"), "qid")
                .groupBy("qid")
                .agg(
                    (
                        F.sum(
                            F.when(
                                F.col("dist")
                                <= F.col("_dk") * (1 + 1e-6) + 1e-12,
                                1,
                            ).otherwise(0)
                        )
                        / F.lit(float(args.k))
                    ).alias("er")
                )
                .agg(F.avg("er"))
                .first()[0]
            )
            msg += f", eps-dist-recall={eps_rec:.3f}"
            # how far above the GT k-th distance do the returned ids
            # sit? The relative-excess distribution adjudicates any
            # plateau at any tolerance: excess ~1e-6 = float-noise
            # ties, ~1e-3 = geometric near-ties (answers as good for
            # any downstream use), >>1e-2 = genuine traversal misses.
            exc = (
                got.join(tie_stats.select("qid", "_dk"), "qid")
                .select(
                    (
                        (F.col("dist") - F.col("_dk"))
                        / F.greatest(F.col("_dk"), F.lit(1e-300))
                    ).alias("x")
                )
                .where(F.col("x") > 0)
                .agg(
                    F.expr("percentile(x, array(0.5, 0.9, 0.99))"),
                    F.max("x"), F.count("*"),
                )
                .first()
            )
            if exc[2]:
                p50, p90, p99 = exc[0]
                log(
                    f"  excess over GT d_k (returned ids above it, "
                    f"n={exc[2]}): p50={p50:.2e} p90={p90:.2e} "
                    f"p99={p99:.2e} max={exc[1]:.2e}"
                )
        log(msg)


if __name__ == "__main__":
    main()
