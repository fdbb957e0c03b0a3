"""One-off scale measurements for the r07-session-4 operators
(triangles, kcore, maxsim, mmr, cohort) — results recorded in SCALE.md.

Run: python scripts/measure_graph_retrieval.py [step]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from vectordbindexing_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="measure-gr", cpus=32, shuffle_partitions=64)
step = sys.argv[1] if len(sys.argv) > 1 else "all"


def timed(label, df):
    t0 = time.time()
    n = df.count()
    print(f"{label}: rows={n} wall={time.time() - t0:.1f}s", flush=True)


N = 500_000
if step in ("all", "graph"):
    # ~2M-edge deterministic graph with 97 heavy hubs (worst-case skew
    # for the wedge join: hub degree ~5k)
    base = spark.range(N).select(F.col("id").alias("i"))
    e = (
        base.select(F.col("i").alias("src"),
                    ((F.col("i") * F.col("i") + 3 * F.col("i") + 1) % N
                     ).alias("dst"))
        .unionAll(base.select(F.col("i").alias("src"),
                              ((F.col("i") + 7) % N).alias("dst")))
        .unionAll(base.select(F.col("i").alias("src"),
                              ((2 * F.col("i") + 11) % N).alias("dst")))
        .unionAll(
            base.where(F.col("i") % 5 == 0)
            .select(F.col("i").alias("src"), (F.col("i") % 97).alias("dst"))
        )
    ).localCheckpoint(eager=True)
    print("edges:", e.count(), flush=True)

    from vectordbindexing_spark.operators.triangles import kcore, triangle_counts

    timed("triangle_counts 2M edges (97 hubs deg~5k)", triangle_counts(e))
    timed("kcore k=4 2M edges", kcore(e, k=4))

if step in ("all", "maxsim"):
    from vectordbindexing_spark.io.synthetic import synthetic_vectors
    from vectordbindexing_spark.operators.retrieval import maxsim_topk

    toks = synthetic_vectors(spark, 200_000, 64, n_modalities=8,
                             id_col="tid", vec_col="vec")
    dt = toks.select((F.col("tid") % 20_000).alias("doc_id"), "vec")
    dt = dt.localCheckpoint(eager=True)
    qt = (
        synthetic_vectors(spark, 32, 64, n_modalities=8, seed=7,
                          id_col="tid", vec_col="vec")
        .select((F.col("tid") % 8).alias("query_id"),
                F.expr("tid div 8").alias("qpos"), "vec")
    )
    timed("maxsim 200k doc-tokens (20k docs x 10) x 32 q-tokens",
          maxsim_topk(dt, qt, k=10))

if step in ("all", "mmr"):
    from vectordbindexing_spark.operators.mmr import mmr_rerank

    # 20k queries x 50 candidates = 1M rows, 64-d vectors
    cand = (
        spark.range(1_000_000)
        .select(
            (F.col("id") % 20_000).alias("query_id"),
            F.col("id").alias("doc_id"),
            (F.col("id") % 1000).cast("double").alias("rel"),
            F.expr(
                "transform(sequence(0, 63), j -> "
                "cast(pmod(id * 2654435761 + j * 40503, 997) as double)"
                " / 997.0)"
            ).alias("vec"),
        )
        .localCheckpoint(eager=True)
    )
    timed("mmr k=5 over 20k queries x 50 cands (1M rows)",
          mmr_rerank(cand, k=5, lam=0.7))

if step in ("all", "cohort"):
    from vectordbindexing_spark.io.tables import load_table
    from vectordbindexing_spark.operators.events import cohort_retention

    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    print("events sf0.1:", ev.count(), flush=True)
    timed("cohort_retention sf0.1 (purchase cohorts)",
          cohort_retention(ev, cohort_event="purchase"))

if step in ("all", "mining"):
    from vectordbindexing_spark.io.synthetic import synthetic_vectors
    from vectordbindexing_spark.operators.mining import mine_triplets

    emb = (
        synthetic_vectors(spark, 100_000, 64, n_modalities=10,
                          id_col="id", vec_col="vec")
        .select("id", "vec", (F.col("id") % 10).alias("label"))
        .localCheckpoint(eager=True)
    )
    timed("mine_triplets 100k x 10 labels, k_neg=5",
          mine_triplets(emb, k_neg=5))

if step in ("all", "graph2"):
    # labelprop + personalized pagerank on the 1.6M-edge hub graph
    from vectordbindexing_spark.operators.labelprop import label_propagation
    from vectordbindexing_spark.operators.pagerank import personalized_pagerank

    N = 500_000
    base = spark.range(N).select(F.col("id").alias("i"))
    e = (
        base.select(F.col("i").alias("src"),
                    ((F.col("i") * F.col("i") + 3 * F.col("i") + 1) % N
                     ).alias("dst"))
        .unionAll(base.select(F.col("i").alias("src"),
                              ((F.col("i") + 7) % N).alias("dst")))
        .unionAll(base.select(F.col("i").alias("src"),
                              ((2 * F.col("i") + 11) % N).alias("dst")))
        .unionAll(
            base.where(F.col("i") % 5 == 0)
            .select(F.col("i").alias("src"), (F.col("i") % 97).alias("dst"))
        )
    ).localCheckpoint(eager=True)
    seeds = spark.range(0, N, 100).select(
        F.col("id").alias("id"), (F.col("id") % 7).alias("label")
    )
    # eager localCheckpoints run at CONSTRUCTION time - time it all
    t0 = time.time()
    n = label_propagation(e, seeds, iters=3).count()
    print(f"label_propagation 1.6M edges, 5k seeds, 3 rounds: "
          f"rows={n} wall={time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    n = personalized_pagerank(e, seeds.select("id"), iters=3).count()
    print(f"personalized_pagerank 1.6M edges, 5k seeds, 3 iters: "
          f"rows={n} wall={time.time() - t0:.1f}s", flush=True)
