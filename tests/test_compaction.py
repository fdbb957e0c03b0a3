"""Delta compaction: fold streamed deltas into a fresh full build."""

import os

from pyspark.sql import functions as F


def test_compact_deltas(spark, tables, tmp_path):
    from vectordbindexing_spark.streaming.ingest import (
        compact_deltas,
        incremental_index_stream,
    )

    emb = tables["embeddings"]
    snap = emb.filter(F.col("vec_id") < 300).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    extra = emb.filter(F.col("vec_id") >= 300).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")).limit(60)
    src = str(tmp_path / "in")
    extra.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("id long, vec array<float>").parquet(src)
    q = incremental_index_stream(stream, str(tmp_path / "delta"),
                                 str(tmp_path / "ck"), knn_k=4,
                                 base_snapshot=snap)
    q.processAllAvailable(); q.stop()

    full, edges = compact_deltas(snap, str(tmp_path / "delta"),
                                 str(tmp_path / "compacted"), knn_k=4)
    assert full.count() == 360
    deg = edges.groupBy("src").count()
    assert deg.count() == 360             # every node linked
    assert deg.agg(F.max("count")).collect()[0][0] <= 8  # 2*knn_k cap
    # persisted artifacts readable
    rv = spark.read.parquet(os.path.join(str(tmp_path / "compacted"), "vectors"))
    re = spark.read.parquet(os.path.join(str(tmp_path / "compacted"), "edges"))
    assert rv.count() == 360 and re.count() == edges.count()
