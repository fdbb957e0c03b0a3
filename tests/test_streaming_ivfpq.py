"""Streaming IVF-PQ upsert: appended micro-batches must be
indistinguishable from a full build with the same frozen quantizers."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _vecs(tables):
    emb = tables["embeddings"]
    return emb.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").alias("vec"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_upsert_stream_matches_full_build(spark, tables, tmp_path):
    from vectordbindexing_spark.operators.ivf import kmeans_fit
    from vectordbindexing_spark.operators.ivfpq import (
        ivfpq_search_index,
        save_ivfpq_index,
    )
    from vectordbindexing_spark.operators.pq import pq_fit
    from vectordbindexing_spark.streaming.ivfpq_ingest import ivfpq_upsert_stream

    v = _vecs(tables)
    base = v.filter(F.col("id") < 300)
    extra = v.filter(F.col("id") >= 300).limit(80)
    queries = v.filter(F.col("id") < 40).select(
        F.col("id").alias("qid"), F.col("vec")
    )

    # quantizers fit on the BASE only — frozen for both paths
    cents = kmeans_fit(base, 8, max_iter=3, id_col="id", vec_col="vec")
    books = pq_fit(base, m=8, ks=16, max_iter=3, id_col="id", vec_col="vec")

    streamed = str(tmp_path / "streamed_idx")
    save_ivfpq_index(base, cents, books, streamed, b_id="id", b_vec="vec")

    feed = str(tmp_path / "feed")
    extra.coalesce(2).write.mode("overwrite").parquet(feed)
    stream = spark.readStream.schema("id long, vec array<float>").parquet(feed)
    q = ivfpq_upsert_stream(stream, streamed, str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()

    full = str(tmp_path / "full_idx")
    save_ivfpq_index(
        base.unionByName(extra), cents, books, full, b_id="id", b_vec="vec"
    )

    got = ivfpq_search_index(queries, streamed, k=5, nprobe=3)
    want = ivfpq_search_index(queries, full, k=5, nprobe=3)
    assert _rows(got) == _rows(want)
    # upserted rows landed inside the existing cid= partition layout
    cids = {
        d
        for d in os.listdir(f"{streamed}/codes")
        if d.startswith("cid=")
    }
    assert cids and cids <= {f"cid={i}" for i in range(8)}


def test_upsert_results_can_return_streamed_rows(spark, tables, tmp_path):
    # a query identical to a streamed-in vector must retrieve it
    from vectordbindexing_spark.operators.ivf import kmeans_fit
    from vectordbindexing_spark.operators.ivfpq import (
        ivfpq_search_index,
        save_ivfpq_index,
    )
    from vectordbindexing_spark.operators.pq import pq_fit
    from vectordbindexing_spark.streaming.ivfpq_ingest import ivfpq_upsert_stream

    v = _vecs(tables)
    base = v.filter(F.col("id") < 200)
    extra = v.filter((F.col("id") >= 200) & (F.col("id") < 240))
    cents = kmeans_fit(base, 8, max_iter=3, id_col="id", vec_col="vec")
    books = pq_fit(base, m=8, ks=16, max_iter=3, id_col="id", vec_col="vec")
    idx = str(tmp_path / "idx")
    save_ivfpq_index(base, cents, books, idx, b_id="id", b_vec="vec")

    feed = str(tmp_path / "feed")
    extra.coalesce(1).write.mode("overwrite").parquet(feed)
    stream = spark.readStream.schema("id long, vec array<float>").parquet(feed)
    q = ivfpq_upsert_stream(stream, idx, str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()

    queries = extra.select(F.col("id").alias("qid"), "vec")
    got = ivfpq_search_index(queries, idx, k=1, nprobe=8)
    hits = {r["qid"]: r["neighbor_id"] for r in got.collect()}
    # with nprobe = nlist (no pruning loss) the nearest code row for a
    # vector's own query is itself unless another vector shares its code
    # word in every sub-space AND has a lower id — allow those exact-tie
    # cases but require the overwhelming majority to self-retrieve
    self_hits = sum(1 for k, nb in hits.items() if k == nb)
    assert self_hits >= int(0.9 * len(hits))


def test_refit_restores_fresh_fit(spark, tables, tmp_path):
    from vectordbindexing_spark.operators.ivfpq import (
        ivfpq_search_index,
        load_ivfpq_arrays,
    )
    from vectordbindexing_spark.streaming.ivfpq_ingest import refit_ivfpq

    v = _vecs(tables).filter(F.col("id") < 300)
    out = str(tmp_path / "refit")
    refit_ivfpq(v, out, nlist=8, m=8, ks=16)
    cents, books = load_ivfpq_arrays(spark, out)
    assert cents.shape[0] == 8 and books.shape[:2] == (8, 16)
    queries = v.filter(F.col("id") < 20).select(F.col("id").alias("qid"), "vec")
    assert ivfpq_search_index(queries, out, k=5, nprobe=4).count() == 20 * 5


def test_refit_distributed_fit_route(spark, tables, tmp_path):
    import pytest

    from vectordbindexing_spark.operators.ivfpq import (
        ivfpq_search_index,
        load_ivfpq_arrays,
    )
    from vectordbindexing_spark.streaming.ivfpq_ingest import refit_ivfpq

    v = _vecs(tables).filter(F.col("id") < 200)
    out = str(tmp_path / "refit_dist")
    refit_ivfpq(v, out, nlist=6, m=8, ks=16, fit="distributed")
    cents, books = load_ivfpq_arrays(spark, out)
    assert cents.shape[0] == 6
    q = v.filter(F.col("id") < 10).select(F.col("id").alias("qid"), "vec")
    assert ivfpq_search_index(q, out, k=3, nprobe=3).count() == 10 * 3
    with pytest.raises(ValueError, match="driver.*distributed"):
        refit_ivfpq(v, out, fit="bogus")
