"""I/O round-trips: fbin/ibin, layer0 TSV, RoarGraph binary, synthetic gen."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_fbin_roundtrip(spark, tmp_path):
    from vectordbindexing_spark.io.fbin import (
        read_fbin,
        read_fbin_np,
        write_fbin,
        write_fbin_np,
    )

    rng = np.random.default_rng(42)
    mat = rng.normal(size=(100, 16)).astype(np.float32)
    p = str(tmp_path / "t.fbin")
    write_fbin_np(p, mat)
    # chunked local read (reference semantics)
    assert np.array_equal(read_fbin_np(p, start_idx=10, chunk_size=5), mat[10:15])
    # distributed read
    df = read_fbin(spark, p, rows_per_task=32)
    rows = {r["id"]: np.asarray(r["vec"], dtype=np.float32) for r in df.collect()}
    assert len(rows) == 100
    assert np.array_equal(rows[7], mat[7])
    # DataFrame → fbin → back
    p2 = str(tmp_path / "t2.fbin")
    write_fbin(df, p2)
    assert np.array_equal(read_fbin_np(p2), mat)


def test_ibin_roundtrip(spark, tmp_path):
    from vectordbindexing_spark.io.fbin import read_ibin, write_ibin_np

    gt = np.arange(60, dtype=np.int32).reshape(10, 6)
    p = str(tmp_path / "gt.ibin")
    write_ibin_np(p, gt)
    df = read_ibin(spark, p, rows_per_task=4)
    rows = {r["qid"]: r["gt_ids"] for r in df.collect()}
    assert rows[3] == list(range(18, 24))


def test_layer0_tsv_roundtrip(spark, tables, tmp_path):
    from vectordbindexing_spark.io.graph_io import load_layer0_tsv, save_layer0_tsv
    from vectordbindexing_spark.operators.graph import knn_graph

    emb = tables["embeddings"].limit(50)
    edges = knn_graph(emb, k=3, id_col="vec_id", vec_col="embedding")
    p = str(tmp_path / "layer0")
    save_layer0_tsv(emb, edges, p, id_col="vec_id", vec_col="embedding")
    back = load_layer0_tsv(spark, p)
    assert back.count() == 50
    adj = {
        r["src"]: sorted(r["nbrs"])
        for r in edges.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs")).collect()
    }
    got = {r["id"]: sorted(r["neighbors"]) for r in back.collect()}
    for nid, nbrs in adj.items():
        assert got[nid] == nbrs
    # vectors survive float32 text round-trip
    v0 = emb.filter(F.col("vec_id") == emb.select(F.min("vec_id")).collect()[0][0])
    orig_vec = np.asarray(v0.collect()[0]["embedding"], dtype=np.float32)
    rt_vec = np.asarray(
        back.filter(F.col("id") == int(v0.collect()[0]["vec_id"])).collect()[0]["vec"],
        dtype=np.float32,
    )
    assert np.allclose(orig_vec, rt_vec, rtol=1e-6)


def test_roargraph_binary_roundtrip(spark, tables, tmp_path):
    from vectordbindexing_spark.io.graph_io import (
        load_roargraph_index,
        save_roargraph_index,
    )
    from vectordbindexing_spark.operators.graph import knn_graph

    emb = tables["embeddings"].limit(40)
    # reindex ids to dense 0..39 (binary format is positional)
    dense = emb.select(
        (F.row_number().over(
            __import__("pyspark").sql.Window.orderBy("vec_id")) - 1
        ).alias("id"),
        F.col("embedding"),
    )
    edges = knn_graph(dense, k=4, id_col="id", vec_col="embedding")
    p = str(tmp_path / "rg.index")
    save_roargraph_index(edges, p, entry_point=7, n_nodes=40)
    ep, back = load_roargraph_index(spark, p)
    assert ep == 7
    assert back.count() == edges.count()
    a = {(r["src"], r["dst"]) for r in edges.select("src", "dst").collect()}
    b = {(r["src"], r["dst"]) for r in back.select("src", "dst").collect()}
    assert a == b


def test_synthetic_generator(spark):
    from vectordbindexing_spark.io.synthetic import synthetic_queries, synthetic_vectors

    base = synthetic_vectors(spark, 300, 16, n_modalities=3, seed=42)
    rows = base.collect()
    assert len(rows) == 300
    norms = [float(np.linalg.norm(r["vec"])) for r in rows[:20]]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)  # unit-normalized
    assert {r["modality"] for r in rows} == {"mod0", "mod1", "mod2"}
    # deterministic
    again = {r["id"]: r["vec"] for r in
             synthetic_vectors(spark, 300, 16, n_modalities=3, seed=42).collect()}
    assert again[5] == rows[5]["vec"] if rows[5]["id"] == 5 else True
    # queries share centers → near their modality's base cluster
    q = synthetic_queries(spark, 30, 16, n_modalities=3, seed=42)
    qr = q.collect()
    assert len(qr) == 30
    bvec = np.stack([np.asarray(r["vec"]) for r in rows])
    bmod = [r["modality"] for r in rows]
    hits = 0
    for r in qr:
        sims = bvec @ np.asarray(r["vec"])
        if bmod[int(np.argmax(sims))] == r["modality"]:
            hits += 1
    assert hits / len(qr) > 0.8  # cross-set cluster structure holds


def test_knn_planner(spark, tables):
    from vectordbindexing_spark.plans.knn_planner import knn, plan_knn

    assert plan_knn(100, 10_000, 10).strategy == "exact-blocked"
    assert plan_knn(500_000, 10_000, 10).strategy == "exact-expr"
    assert plan_knn(100, 5_000_000, 10, approximate_ok=True).strategy == "lsh"
    assert plan_knn(
        100, 5_000_000, 10, approximate_ok=True, repeated_queries=True
    ).strategy == "ivf"
    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") % 10 == 0).limit(5)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    out = knn(q, b, k=3, q_id="vec_id", q_vec="embedding",
              b_id="vec_id", b_vec="embedding")
    assert out.count() == 15


def test_graph_serving_planner(spark, tables, tmp_path, monkeypatch):
    import vectordbindexing_spark.plans.knn_planner as kp
    from vectordbindexing_spark.plans.knn_planner import (
        graph_knn,
        plan_graph_serving,
    )

    assert plan_graph_serving(10_000).strategy == "compact"
    big = plan_graph_serving(10_000_000)
    assert big.strategy == "sharded"
    assert big.params["num_shards"] == 100  # ceil(10M / 100k)

    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") % 10 == 0).limit(5)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    compact = graph_knn(q, b, k=3, q_id="vec_id", q_vec="embedding",
                        b_id="vec_id", b_vec="embedding")
    assert compact.count() == 15
    assert set(compact.columns) == {"qid", "nbr_rank", "neighbor_id", "dist"}
    # shrink the threshold: same call must route through the persisted
    # sharded artifact and still produce k rows per query
    monkeypatch.setattr(kp, "COMPACT_INDEX_LIMIT", 10)
    monkeypatch.setattr(kp, "SHARD_TARGET_ROWS", 300)
    art_path = str(tmp_path / "art")
    sharded = graph_knn(q, b, k=3, q_id="vec_id", q_vec="embedding",
                        b_id="vec_id", b_vec="embedding",
                        artifact_path=art_path)
    assert sharded.count() == 15
    import os
    assert any(p.startswith("shard=") for p in os.listdir(art_path))
