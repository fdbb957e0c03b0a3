"""IVF KNN recall + whitening numerical correctness vs numpy."""

import numpy as np
from pyspark.sql import functions as F


def test_ivf_knn_recall(spark, tables):
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.ivf import ivf_knn

    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") % 10 == 0)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    got = ivf_knn(q, b, k=10, nlist=8, nprobe=4, metric="cosine",
                  q_id="vec_id", q_vec="embedding",
                  b_id="vec_id", b_vec="embedding")
    ex = exact_knn(q, b, k=10, metric="cosine", impl="blocked",
                   q_id="vec_id", q_vec="embedding",
                   b_id="vec_id", b_vec="embedding")
    gp = got.groupBy("qid").agg(F.collect_set("neighbor_id").alias("p"))
    ep = ex.groupBy("qid").agg(F.collect_set("neighbor_id").alias("g"))
    rec = (
        gp.join(ep, "qid")
        .select((F.size(F.array_intersect("p", "g")) / 10.0).alias("r"))
        .agg(F.avg("r")).collect()[0][0]
    )
    assert rec >= 0.5, f"ivf recall too low: {rec}"  # nprobe=nlist/2


def test_ivf_full_probe_equals_exact(spark, tables):
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.ivf import ivf_knn

    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") % 10 == 0).limit(10)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    got = ivf_knn(q, b, k=5, nlist=4, nprobe=4, metric="cosine",
                  q_id="vec_id", q_vec="embedding",
                  b_id="vec_id", b_vec="embedding")
    ex = exact_knn(q, b, k=5, metric="cosine", impl="blocked",
                   q_id="vec_id", q_vec="embedding",
                   b_id="vec_id", b_vec="embedding")
    g = {(r["qid"], r["nbr_rank"]): r["neighbor_id"] for r in got.collect()}
    e = {(r["qid"], r["nbr_rank"]): r["neighbor_id"] for r in ex.collect()}
    assert g == e  # probing every cell must reproduce exact KNN


def test_whitening_matches_numpy(spark, tables):
    from vectordbindexing_spark.operators.preprocess import (
        whitening_fit,
        whitening_transform,
    )

    emb = tables["embeddings"].limit(200)
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])

    model = whitening_fit(emb, vec_col="embedding", mode="pca")
    # fit parity
    assert np.allclose(model.mean, X.mean(axis=0), atol=1e-9)
    got = whitening_transform(emb, model, vec_col="embedding")
    out = {
        r["vec_id"]: np.asarray(r["wvec"]) for r in got.select("vec_id", "wvec").collect()
    }
    want = model.transform_np(X)
    for i, r in enumerate(rows):
        assert np.allclose(out[r["vec_id"]], want[i], atol=1e-9)
    # whitened covariance ≈ identity (pca mode, full rank)
    W = np.stack([out[r["vec_id"]] for r in rows])
    cov = np.cov(W.T, bias=True)
    assert np.allclose(np.diag(cov), 1.0, atol=1e-6)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-6


def test_whitening_modality_scaling(spark, tables):
    from vectordbindexing_spark.operators.preprocess import (
        whitening_fit,
        whitening_transform,
    )

    emb = tables["embeddings"].withColumn(
        "modality", F.when(F.col("label") < 5, "text").otherwise("image")
    )
    model = whitening_fit(emb, vec_col="embedding", mode="zca",
                          modality_col="modality")
    assert set(model.modality_scale) == {"text", "image"}
    got = whitening_transform(emb, model, vec_col="embedding",
                              modality_col="modality")
    norms = (
        got.select(
            "modality",
            F.sqrt(F.aggregate("wvec", F.lit(0.0), lambda a, x: a + x * x)).alias("n"),
        )
        .groupBy("modality").agg(F.avg("n").alias("avg_n")).collect()
    )
    vals = [r["avg_n"] for r in norms]
    assert abs(vals[0] - vals[1]) / max(vals) < 0.05  # equalized mean norms
