"""Product-quantization tests: codebook determinism, encode invariants,
ADC vs exact recall (with and without rerank), shortlist semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.exact_knn import exact_knn
from vectordbindexing_spark.operators.pq import (
    pq_encode,
    pq_fit,
    pq_fit_arrays,
    pq_knn,
)


@pytest.fixture(scope="module")
def emb_split(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 10 == 0)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    return q, b


def test_fit_deterministic_and_matches_arrays(spark, emb_split):
    _, b = emb_split
    books1 = pq_fit(b, m=8, ks=16, max_iter=3, id_col="vec_id", vec_col="embedding")
    books2 = pq_fit(b, m=8, ks=16, max_iter=3, id_col="vec_id", vec_col="embedding")
    assert books1.shape == (8, 16, 8)
    np.testing.assert_array_equal(books1, books2)
    # Spark fit == plain-numpy fit on the same rows (the oracle's premise)
    rows = b.select("vec_id", "embedding").toPandas()
    ids = rows["vec_id"].to_numpy()
    X = np.stack([np.asarray(v, float) for v in rows["embedding"]])
    np.testing.assert_array_equal(
        books1, pq_fit_arrays(ids, X, 8, 16, 3)
    )


def test_fit_rejects_indivisible_dim():
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit_arrays(np.arange(10), np.zeros((10, 10)), m=3, ks=2)


def test_encode_shape_and_range(spark, emb_split):
    _, b = emb_split
    books = pq_fit(b, m=8, ks=16, max_iter=2, id_col="vec_id", vec_col="embedding")
    enc = pq_encode(b, books, id_col="vec_id", vec_col="embedding").toPandas()
    assert len(enc) == b.count()
    codes = np.stack([np.asarray(c) for c in enc["codes"]])
    assert codes.shape[1] == 8
    assert codes.min() >= 0 and codes.max() < 16
    # every subspace actually uses multiple codes (fit didn't collapse)
    assert all(len(np.unique(codes[:, j])) > 1 for j in range(8))


def test_adc_recall_and_rerank_improvement(spark, emb_split):
    q, b = emb_split
    kw = dict(q_id="vec_id", q_vec="embedding", b_id="vec_id", b_vec="embedding")
    ex = exact_knn(q, b, k=10, metric="l2", impl="blocked", **kw)
    adc = pq_knn(q, b, k=10, m=8, ks=16, max_iter=3, **kw)
    rr = pq_knn(q, b, k=10, m=8, ks=16, max_iter=3, rerank=50, **kw)

    def recall(approx):
        gp = approx.groupBy("qid").agg(F.collect_set("neighbor_id").alias("p"))
        ep = ex.groupBy("qid").agg(F.collect_set("neighbor_id").alias("g"))
        row = (
            gp.join(ep, "qid")
            .select((F.size(F.array_intersect("p", "g")) / 10.0).alias("r"))
            .agg(F.avg("r").alias("r"))
            .collect()[0]
        )
        return row["r"]

    r_adc, r_rr = recall(adc), recall(rr)
    # 32-bit codes on 64-dim Gaussians: ADC alone is lossy but far above
    # chance; the exact-rerank stage must recover most of the loss
    assert r_adc > 0.2
    assert r_rr >= r_adc
    assert r_rr > 0.55


def test_adc_query_blocking_is_invisible(spark, emb_split, monkeypatch):
    """The ADC scan processes queries in memory-bounded blocks
    (_ADC_BLOCK_TARGET_BYTES); per-query results are independent, so a
    pathologically tiny block size must yield the identical result set."""
    import vectordbindexing_spark.operators.pq as pqmod

    q, b = emb_split
    kw = dict(q_id="vec_id", q_vec="embedding", b_id="vec_id", b_vec="embedding")
    books = pq_fit(b, m=8, ks=16, max_iter=2, id_col="vec_id", vec_col="embedding")
    full = pq_knn(q, b, k=10, codebooks=books, **kw).toPandas()
    # 8 bytes → q_block == 1: every query is its own block
    monkeypatch.setattr(pqmod, "_ADC_BLOCK_TARGET_BYTES", 8)
    tiny = pq_knn(q, b, k=10, codebooks=books, **kw).toPandas()
    key = ["qid", "nbr_rank"]
    full = full.sort_values(key).reset_index(drop=True)
    tiny = tiny.sort_values(key).reset_index(drop=True)
    assert full["neighbor_id"].tolist() == tiny["neighbor_id"].tolist()
    np.testing.assert_array_equal(
        full["dist"].to_numpy(), tiny["dist"].to_numpy()
    )


def test_fit_rejects_duplicate_ids():
    ids = np.array([1, 2, 2, 3])
    with pytest.raises(ValueError, match="unique ids"):
        pq_fit_arrays(ids, np.zeros((4, 8)), m=2, ks=2)


def test_rerank_shortlist_is_exact_on_full_width(spark, emb_split):
    """rerank=|base| makes the shortlist the whole corpus → results must
    equal exact KNN (squared-L2 ranking == L2 ranking)."""
    q, b = emb_split
    kw = dict(q_id="vec_id", q_vec="embedding", b_id="vec_id", b_vec="embedding")
    nb = b.count()
    got = pq_knn(q, b, k=5, m=8, ks=16, max_iter=2, rerank=nb, **kw).select(
        "qid", "nbr_rank", "neighbor_id"
    )
    ex = exact_knn(q, b, k=5, metric="l2", impl="blocked", **kw).select(
        "qid", "nbr_rank", "neighbor_id"
    )
    assert got.exceptAll(ex).count() == 0 and ex.exceptAll(got).count() == 0
