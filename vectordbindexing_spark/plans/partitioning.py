"""Physical-layout helpers.

Compute-dense Arrow kernels (distance matmuls, hashing, whitening) are
CPU-bound per row: their parallelism is the number of input partitions, not
the data volume. A small-but-dense table read from one parquet file arrives
as ONE partition and would pin a single core; widen it first. (On a real
cluster the same applies per-executor — the 200 MB embedding shard that is
one HDFS block still wants cores × partitions.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def repartition_for_compute(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition iff the DataFrame has fewer partitions than
    the session's default parallelism (no-op otherwise — don't add a
    shuffle the layout doesn't need)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
