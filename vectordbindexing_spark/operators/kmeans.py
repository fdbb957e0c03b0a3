"""Fixed-round Lloyd's k-means — the standalone clustering primitive
behind the engine's quantizer fits (IVF/IVF-PQ coarse codebooks),
SemDeDup bucketing, and the silhouette consumers.

Spark-first shape: each round is ONE broadcast of the k·d centroid
table against ONE scan of the points (argmin assignment via a struct
min — ties on the lower cluster id) followed by a narrow
per-(cluster, dimension) mean aggregation — no pair generator, no
iterative shuffle growth; ``localCheckpoint`` truncates the lineage
per round exactly like the pagerank loop. Fixed iteration count,
never run-to-convergence: the DuckDB oracle (`oracles.kmeans_sql`)
unrolls the same rounds as materialized CTEs.

Determinism contract (the oracle hash gate):

* init: the k points with the smallest ``(det_hash64(id), id)`` key —
  content-independent, seeded by nothing, identical in both engines;
  cluster labels are the 0-based ordinals of that seed order;
* assignment metric: squared L2 built from the sequential
  ``zip_with``/fold expression tree (`list_sum(list_transform(...))`
  in DuckDB — the proven silhouette pairing);
* centroid update: per-dimension mean folded in point-id order
  (``exact_mean``; auto-switches to plain ``avg()`` past
  KMEANS_FOLD_CELL_LIMIT exploded cells, the BM25/pagerank
  fold-cost treatment);
* clusters that lose every member keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.hashing import det_hash64

#: auto exact_mean: past this many exploded (point, dimension) cells
#: PER ROUND the id-ordered centroid-mean fold switches to plain avg()
KMEANS_FOLD_CELL_LIMIT = 2_000_000


def _seed_centroids(pts: DataFrame, k: int) -> DataFrame:
    """Deterministic seeds: the k points with the smallest
    (det_hash64(id), id) key; labels are the 0-based ordinals of that
    order. orderBy+limit is TakeOrdered (per-partition top-k + driver
    merge — the sketch.py:110 idiom), never a global single-task
    Window sort over the corpus; the rank window then runs over only
    the k survivors. Plan shape pinned in tests/test_plans.py."""
    seeds = (
        pts.withColumn("_h", det_hash64(F.col("id").cast("string")))
        .orderBy(F.col("_h"), F.col("id"))
        .limit(k)
    )
    w = Window.orderBy(F.col("_h"), F.col("id"))
    return seeds.withColumn("_rn", F.row_number().over(w)).select(
        (F.col("_rn") - 1).cast("long").alias("cluster"),
        F.col("v").alias("cv"),
    )


def _sq_l2(v, cv):
    return F.aggregate(
        F.zip_with(v, cv, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans(
    points: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "id",
    vec_col: str = "vec",
    exact_mean: bool | None = None,
) -> DataFrame:
    """Fixed-round Lloyd's over squared L2. Returns
    ``(id, cluster, dist)`` — the assignment against the centroids
    after ``iters`` update rounds, ``dist`` the squared L2 to that
    centroid rounded to 6 dp, ``cluster`` the 0-based seed ordinal.
    Fewer than k distinct points simply yields fewer clusters."""
    if k < 1 or iters < 1:
        raise ValueError("need k >= 1 and iters >= 1")
    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).where(F.col("v").isNotNull())
    if exact_mean is None:
        first = pts.limit(1).collect()
        dim = len(first[0]["v"]) if first else 1
        probe = max(1, KMEANS_FOLD_CELL_LIMIT // max(1, dim))
        exact_mean = pts.limit(probe + 1).count() <= probe

    cents = _seed_centroids(pts, k).localCheckpoint(eager=True)

    if exact_mean:
        mean_agg = F.aggregate(
            F.array_sort(F.collect_list(F.struct("id", "x"))),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ) / F.count(F.lit(1)).cast("double")
    else:
        mean_agg = F.avg("x")

    # broadcast hygiene: each scale-path round broadcasts its own k×d
    # centroid matrix; the round's eager checkpoint fully consumes it,
    # so it is unpersisted before the next round starts — at most one
    # round's copy is ever live on the executors (plus the final
    # assignment's, which the returned lazy DataFrame still needs).
    round_bcs: list = []

    def assign(cent_df):
        if not exact_mean:
            # scale path: broadcast the k×d centroid matrix into an
            # Arrow kernel and argmin with one BLAS matmul per batch —
            # the declarative branch below (the oracle-exact expression
            # tree) evaluates k sequential folds per point instead.
            # numpy argmin returns the FIRST minimum; centroids are
            # ordered by cluster id, so exact float ties break low —
            # the same (d, cluster) order as the struct min.
            import numpy as np
            import pandas as pd

            rows = cent_df.orderBy("cluster").collect()  # k rows, tiny
            ids_np = np.array([r["cluster"] for r in rows], dtype=np.int64)
            C = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in rows])
            bc = pts.sparkSession.sparkContext.broadcast((ids_np, C))
            round_bcs.append(bc)

            def part(batches):
                cl, Cm = bc.value
                cs = (Cm * Cm).sum(axis=1)
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    X = np.stack(
                        [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
                    )
                    D = (
                        (X * X).sum(axis=1)[:, None]
                        + cs[None, :]
                        - 2.0 * (X @ Cm.T)
                    )
                    np.maximum(D, 0.0, out=D)  # FP cancellation guard
                    j = D.argmin(axis=1)
                    yield pd.DataFrame(
                        {
                            "id": pdf["id"],
                            "v": pdf["v"],
                            "cluster": cl[j],
                            "dist": D[np.arange(len(j)), j],
                        }
                    )

            return pts.mapInPandas(
                part, "id long, v array<double>, cluster long, dist double"
            )
        scored = pts.crossJoin(
            F.broadcast(cent_df.withColumnRenamed("cluster", "_c"))
        ).select(
            "id", "v",
            F.struct(_sq_l2(F.col("v"), F.col("cv")).alias("d"),
                     F.col("_c").alias("c")).alias("_dc"),
        )
        return scored.groupBy("id", "v").agg(F.min("_dc").alias("_m")).select(
            "id", "v",
            F.col("_m.c").alias("cluster"),
            F.col("_m.d").alias("dist"),
        )

    for _ in range(iters):
        members = assign(cents).select(
            "id", "cluster", F.posexplode("v").alias("pos", "x")
        )
        means = (
            members.groupBy("cluster", "pos")
            .agg(mean_agg.alias("mx"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s["mx"],
                ).alias("nv")
            )
        )
        # a cluster that lost every member keeps its previous centroid
        cents = (
            cents.join(means, "cluster", "left")
            .select(
                "cluster",
                F.coalesce(F.col("nv"), F.col("cv")).alias("cv"),
            )
            .localCheckpoint(eager=True)
        )
        while round_bcs:  # consumed by the eager checkpoint above
            round_bcs.pop().unpersist()
    return assign(cents).select(
        "id", "cluster", F.round("dist", 6).alias("dist")
    )
