"""Graph-artifact streaming upsert: incremental inserts stay servable
(new nodes reachable via back-links), replay is idempotent, and the
periodic refresh makes the artifact EXACTLY the bulk build of the
union corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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
from vectordbindexing_spark.streaming.graph_ingest import (
    graph_upsert_stream,
    init_graph_artifact,
    load_graph_artifact,
    upsert_graph_artifact,
)

N0, NB, D, K = 600, 100, 16, 10
M0, M1 = 16, 8


@pytest.fixture(scope="module")
def corpus(spark):
    full = synthetic_vectors(spark, N0 + 2 * NB, D, n_modalities=8).select(
        "id", "vec"
    ).localCheckpoint(eager=True)
    base = full.where(F.col("id") < N0)
    b1 = full.where((F.col("id") >= N0) & (F.col("id") < N0 + NB))
    b2 = full.where(F.col("id") >= N0 + NB)
    q = synthetic_queries(spark, 50, D, n_modalities=8).select(
        "qid", "vec"
    ).localCheckpoint(eager=True)
    return full, base, b1, b2, q


def _recall(spark, q, vecs, edges, gt):
    idx = compact_index(edges, vecs)
    pred = graph_search(q, idx, k=K, ef_search=64)
    both = (
        pred.groupBy("qid").agg(F.collect_set("neighbor_id").alias("p"))
        .join(gt, "qid")
    )
    return both.select(
        F.avg(F.size(F.array_intersect("p", "g")) / float(K)).alias("r")
    ).first()["r"]


def _gt(q, vecs):
    return (
        exact_knn(q, vecs, K, "cosine")
        .groupBy("qid")
        .agg(F.collect_set("neighbor_id").alias("g"))
        .localCheckpoint(eager=True)
    )


def test_upsert_keeps_new_nodes_servable_and_refresh_equals_rebuild(
    spark, corpus, tmp_path
):
    full, base, b1, b2, q = corpus
    art = str(tmp_path / "graph_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)

    # batch 1: incremental (no refresh at factor 2.0)
    assert upsert_graph_artifact(b1, art, refresh_factor=2.0) == "upsert"
    vecs, edges, meta = load_graph_artifact(spark, art)
    union1 = base.unionByName(b1)
    assert vecs.count() == N0 + NB

    # new nodes must be REACHABLE: back-links exist and queries recover
    # them — compare against the bulk rebuild of the same union
    gt1 = _gt(q, union1)
    r_upsert = _recall(spark, q, vecs, edges, gt1)
    rebuilt = build_two_layer_index(union1, M0=M0, M1=M1)
    r_rebuild = _recall(spark, q, union1, rebuilt, gt1)
    assert r_upsert >= r_rebuild - 0.05, (r_upsert, r_rebuild)
    assert r_upsert >= 0.8, r_upsert
    # incoming edges to inserted nodes exist on layer 0
    incoming = edges.where(
        (F.col("layer") == 0) & (F.col("dst") >= N0)
    ).count()
    assert incoming > 0

    # replay of the SAME batch is a no-op on the state
    before = sorted(map(tuple, edges.collect()))
    assert upsert_graph_artifact(b1, art, refresh_factor=2.0) == "upsert"
    _, edges_replay, _ = load_graph_artifact(spark, art)
    assert sorted(map(tuple, edges_replay.collect())) == before

    # batch 2 crosses refresh_factor 1.2 -> full rebuild on the union;
    # the artifact must now equal the bulk build EXACTLY
    assert upsert_graph_artifact(b2, art, refresh_factor=1.2) == "rebuild"
    vecs2, edges2, meta2 = load_graph_artifact(spark, art)
    assert meta2["n_at_rebuild"] == N0 + 2 * NB
    want = build_two_layer_index(full, M0=M0, M1=M1)
    got_rows = sorted(
        (r["layer"], r["src"], r["dst"]) for r in edges2.collect()
    )
    want_rows = sorted(
        (r["layer"], r["src"], r["dst"]) for r in want.collect()
    )
    assert got_rows == want_rows


def test_graph_upsert_stream_end_to_end(spark, corpus, tmp_path):
    full, base, b1, b2, q = corpus
    art = str(tmp_path / "stream_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)
    feed = str(tmp_path / "feed")
    b1.write.parquet(feed + "/b1")

    stream = spark.readStream.schema("id long, vec array<double>").parquet(
        feed + "/*"
    )
    qy = graph_upsert_stream(
        stream, art, str(tmp_path / "ckpt"), refresh_factor=5.0
    )
    qy.awaitTermination(300)
    vecs, edges, _ = load_graph_artifact(spark, art)
    assert vecs.count() == N0 + NB
    gt1 = _gt(q, base.unionByName(b1))
    assert _recall(spark, q, vecs, edges, gt1) >= 0.8
