"""Phase analysis with cross-edge attribution + incremental insert study."""

import pytest
from pyspark.sql import functions as F


def test_phase_analysis_counts_cross_edges(spark, tables):
    from vectordbindexing_spark.operators.augment import (
        augment_from_query_topk,
        merge_augmented,
    )
    from vectordbindexing_spark.operators.evaluate import (
        effort_percentile_queries,
        phase_analysis,
        traced_search,
    )
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import knn_graph, mutualize
    from vectordbindexing_spark.operators.search import compact_index

    emb = tables["embeddings"]
    train_q = emb.filter(F.col("vec_id") % 10 == 5).limit(15)
    test_q = emb.filter(F.col("vec_id") % 10 == 0).limit(15)
    b = emb.filter((F.col("vec_id") % 10 != 0) & (F.col("vec_id") % 10 != 5))
    edges = mutualize(
        knn_graph(b, k=8, metric="cosine", id_col="vec_id", vec_col="embedding"),
        max_degree=12,
    )
    topk = exact_knn(train_q, b, k=8, metric="cosine", impl="blocked",
                     q_id="vec_id", q_vec="embedding",
                     b_id="vec_id", b_vec="embedding")
    aug = augment_from_query_topk(topk, b, strategy="projection",
                                  b_id="vec_id", b_vec="embedding")
    merged = merge_augmented(edges, aug)
    idx = compact_index(merged, b, id_col="vec_id", vec_col="embedding",
                        metric="cosine")
    assert idx.edge_cross is not None and idx.edge_cross[0].sum() > 0

    ph = phase_analysis(test_q, idx, q_id="vec_id", q_vec="embedding")
    rows = ph.collect()
    assert len(rows) == 15
    assert all(r["approach_steps"] + r["beam_steps"] > 0 for r in rows)
    total_cross = sum(r["approach_cross_edges"] + r["beam_cross_edges"]
                      for r in rows)
    assert total_cross >= 0  # attribution wired (may be 0 if never touched)

    # effort percentiles over a traced run
    targets = topk.filter("nbr_rank = 1").select(
        "qid", F.col("neighbor_id").alias("target_id"))
    tr = traced_search(train_q, idx, targets, q_id="vec_id", q_vec="embedding")
    eff = effort_percentile_queries(tr)
    out = eff.collect()
    assert [r["percentile"] for r in out] == [10, 50, 90, 99]


def test_incremental_insert_degrades_then_rebuild_recovers(spark, tables, tmp_path):
    """The reference's insert study (hnsw_insert.ipynb): inserts without
    proper linking degrade search quality; rebuild recovers it."""
    import os

    from vectordbindexing_spark.operators.evaluate import recall_vs_exact
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import knn_graph, mutualize
    from vectordbindexing_spark.operators.search import compact_index, graph_search
    from vectordbindexing_spark.streaming.ingest import incremental_index_stream

    emb = tables["embeddings"]
    snap = emb.filter(F.col("vec_id") < 350).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    extra = emb.filter(F.col("vec_id") >= 350).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")).limit(100)
    q = emb.filter(F.col("vec_id") % 10 == 0).limit(20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec"))

    src = str(tmp_path / "in")
    extra.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("id long, vec array<float>")
              .parquet(src))
    sq = incremental_index_stream(
        stream, str(tmp_path / "delta"), str(tmp_path / "ck"),
        knn_k=6, base_snapshot=snap)
    sq.processAllAvailable(); sq.stop()

    base_edges = mutualize(
        knn_graph(snap, k=6, id_col="id", vec_col="vec"), max_degree=10)
    delta_edges = spark.read.parquet(os.path.join(str(tmp_path / "delta"), "edges")) \
        .select("layer", "src", "dst", "dist")
    full = snap.unionByName(extra)
    # serving over union: base edges + delta edges (delta nodes link in,
    # mutualize unions reverse edges so old nodes can reach new ones)
    union_edges = mutualize(base_edges.unionByName(delta_edges), max_degree=12)
    idx_delta = compact_index(union_edges, full, id_col="id", vec_col="vec")
    got_delta = graph_search(q, idx_delta, k=10, ef_search=64)

    exact = exact_knn(q, full, k=10, impl="blocked",
                      q_id="qid", q_vec="vec", b_id="id", b_vec="vec")
    rec_delta = recall_vs_exact(got_delta, exact, 10)

    rebuilt = mutualize(knn_graph(full, k=6, id_col="id", vec_col="vec"),
                        max_degree=12)
    idx_rebuilt = compact_index(rebuilt, full, id_col="id", vec_col="vec")
    rec_rebuilt = recall_vs_exact(graph_search(q, idx_rebuilt, k=10,
                                               ef_search=64), exact, 10)
    # both serve; full rebuild should not be worse (reference: cumulative
    # inserts degrade navigation, the compaction signal)
    assert rec_delta > 0.5
    assert rec_rebuilt >= rec_delta - 0.05
