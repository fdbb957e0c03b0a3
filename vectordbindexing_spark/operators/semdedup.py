"""SemDeDup — semantic deduplication by cluster-then-prune (Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023; the embedding-space dedup real LLM pipelines run
between exact/MinHash text dedup and training).

Pipeline: k-means the embedding space (the same deterministic
driver-sample fit IVF uses), assign every vector to its cell, then
compare ONLY within-cell pairs — the quadratic pair search collapses
from n² to Σ|cell|², which is the paper's entire scaling argument.
Pairs above the cosine-similarity threshold feed the shared
connected-components grouping, and each duplicate group keeps its
minimum id (a deterministic stand-in for the paper's
keep-lowest-centroid-similarity policy — swap the keeper rule
downstream if needed; the groups are the expensive part).

At 100 TB: fit is sample-bounded, assignment is one broadcast-centroid
scan, the self-join shuffles on cid (cells are the skew knob — more
clusters, smaller cells, fewer candidate pairs), scoring is the
Arrow-vectorized pair kernel, and components run the O(log n)
large-star/small-star rounds. Every stage reuses an existing
oracle-pinned operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semantic_neardup_pairs(
    df: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.4,
    max_iter: int = 3,
    id_col: str = "id",
    vec_col: str = "vec",
    centroids=None,
) -> DataFrame:
    """(id_a, id_b, sim) pairs with cosine similarity ≥ ``threshold``
    among vectors assigned to the SAME k-means cell (id_a < id_b)."""
    from vectordbindexing_spark.functions.vector import pair_dist_udf
    from vectordbindexing_spark.operators.ivf import ivf_assign, kmeans_fit

    base = (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).alias("vec"),
        )
        .localCheckpoint(eager=True)  # consumed by fit + assign + join
    )
    if centroids is None:
        centroids = kmeans_fit(
            base, n_clusters, max_iter=max_iter, id_col="id", vec_col="vec"
        )
    assigned = ivf_assign(base, centroids, id_col="id", vec_col="vec")
    sided = base.join(assigned, "id")
    a = sided.select(
        F.col("cid"), F.col("id").alias("id_a"), F.col("vec").alias("_va")
    )
    b = sided.select(
        F.col("cid"), F.col("id").alias("id_b"), F.col("vec").alias("_vb")
    )
    # Round the distance to 6 decimals BEFORE thresholding: Spark's
    # einsum/BLAS cosine and the oracle's sequential list_inner_product
    # can differ by a ulp, and an unrounded `dist <= 1-threshold` would
    # let that ulp flip pair membership (and hence group assignment) at
    # the boundary. Rounding first absorbs it on both sides.
    pairs = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.round(pair_dist_udf("cosine")("_va", "_vb"), 6))
        .filter(F.col("dist") <= F.lit(1.0 - threshold))
    )
    return pairs.select(
        "id_a", "id_b", F.round(1.0 - F.col("dist"), 6).alias("sim")
    )


def semantic_dedup(
    df: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.4,
    max_iter: int = 3,
    id_col: str = "id",
    vec_col: str = "vec",
    centroids=None,
) -> DataFrame:
    """Full SemDeDup assignment: (id, group_id, group_size, is_keeper)
    for EVERY row (near-dup groups share a group_id = their minimum id;
    singletons keep themselves)."""
    from vectordbindexing_spark.operators.components import dedup_groups

    pairs = semantic_neardup_pairs(
        df, n_clusters, threshold, max_iter, id_col, vec_col, centroids
    )
    return dedup_groups(
        df.filter(F.col(vec_col).isNotNull()), pairs, id_col=id_col
    )
