"""SimHash LSH candidate generation + bucketed approximate KNN.

Reference semantics: `simple_sim_hash.py` — sign-of-projection bits packed
to an int bucket key, bucket size cap 20 000, query probes its exact bucket
plus all Hamming-radius-1 neighbors (`simple_sim_hash.py:26-33`, used by
`hnsw_cosine.py:137-148`). Extended here to standard multi-table LSH
(L independent plane families) because a single 16-bit table recalls poorly
on high-dimensional data.

Spark formulation: the bucket table is an equi-join key — candidate volume
scales with bucket collisions, not |Q|×|B|. This is the engine's scalable
KNN pruning strategy (SURVEY §4 "candidate-pool pruning"). Hyperplanes are
a deterministic LCG family (functions.hashing) instead of seeded
np.random.randn so the DuckDB oracle can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.hashing import simhash_bits
from vectordbindexing_spark.functions.vector import metric_dist, to_double_array
from vectordbindexing_spark.operators.topk import topk_per_group

DEFAULT_BUCKET_CAP = 20_000  # simple_sim_hash.py:10


def _table_bucket(vec: Column, num_bits: int, table: int) -> Column:
    """Bucket key for one LSH table, disjoint across tables."""
    return simhash_bits(vec, num_bits, table) + F.lit(table * (1 << num_bits)).cast(
        "long"
    )


def simhash_buckets(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
    num_bits: int = 16,
    num_tables: int = 1,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """(id, bucket) table over ``num_tables`` independent SimHash tables.

    Bucket ids are disjoint across tables (table t occupies
    [t·2^bits, (t+1)·2^bits)). Cap keeps the ``bucket_cap`` smallest ids
    per bucket (deterministic), mirroring the reference's insertion cap.
    """
    buckets = F.array(
        *[_table_bucket(F.col(vec_col), num_bits, t) for t in range(num_tables)]
    )
    out = df.select(
        F.col(id_col).cast("long").alias("id"), F.explode(buckets).alias("bucket")
    )
    if bucket_cap is not None:
        out = (
            topk_per_group(out, ["bucket"], "id", bucket_cap, rank_name="_rn")
            .drop("_rn")
        )
    return out.select("id", "bucket")


def probe_buckets(bucket: Column, num_bits: int) -> Column:
    """Exact bucket + all Hamming-radius-1 flips (1 + num_bits probes);
    flips stay inside the bucket's own table range."""
    flips = [
        bucket.bitwiseXOR(F.lit(1 << j).cast("long")) for j in range(num_bits)
    ]
    return F.array(bucket, *flips)


def lsh_knn(
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    num_bits: int = 8,
    num_tables: int = 8,
    q_id: str = "qid",
    q_vec: str = "vec",
    b_id: str = "id",
    b_vec: str = "vec",
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Approximate KNN: SimHash bucket equi-join (radius-1 probing over
    ``num_tables`` tables) → exact distance on the candidate union →
    per-query top-k.

    Output schema matches exact_knn: (qid, nbr_rank, neighbor_id, dist).
    Queries whose probes hit fewer than k distinct candidates return fewer
    rows — recall/coverage tradeoff is (num_bits, num_tables).
    """
    bt = simhash_buckets(base, b_id, b_vec, num_bits, num_tables, bucket_cap)
    q = queries.select(
        F.col(q_id).cast("long").alias("qid"),
        to_double_array(q_vec).alias("_qv"),
        F.explode(
            F.flatten(
                F.array(
                    *[
                        probe_buckets(
                            _table_bucket(F.col(q_vec), num_bits, t), num_bits
                        )
                        for t in range(num_tables)
                    ]
                )
            )
        ).alias("bucket"),
    )
    cand = (
        q.join(bt, "bucket")
        .select("qid", "_qv", F.col("id").alias("neighbor_id"))
        .dropDuplicates(["qid", "neighbor_id"])
    )
    bv = base.select(
        F.col(b_id).cast("long").alias("neighbor_id"), to_double_array(b_vec).alias("_bv")
    )
    scored = cand.join(bv, "neighbor_id").withColumn(
        "dist", metric_dist("_qv", "_bv", metric)
    )
    ranked = topk_per_group(
        scored.select("qid", "neighbor_id", "dist"), ["qid"], "dist", k,
        tie_col="neighbor_id",
    )
    return ranked.select("qid", "nbr_rank", "neighbor_id", "dist")
