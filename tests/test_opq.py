"""OPQ contract: orthogonality, monotone reconstruction-error win over
plain PQ on correlated data, degenerate-rotation ≡ plain PQ delegation,
and Spark↔DuckDB oracle parity (rotation + codebook literals)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.opq import (
    opq_decode_np,
    opq_fit_arrays,
    opq_knn,
)
from vectordbindexing_spark.operators.pq import (
    encode_codes_np,
    pq_fit_arrays,
)


def _correlated(n=400, d=16, seed=11):
    """Latent low-rank + mixing: strong cross-dimension correlation so a
    contiguous subspace split is provably suboptimal for plain PQ."""
    rng = np.random.default_rng(seed)
    Z = rng.normal(size=(n, d)) * np.linspace(3.0, 0.2, d)
    A = rng.normal(size=(d, d))
    return np.arange(n, dtype=np.int64), Z @ A


def _recon_err(X, R, books, m):
    Xr = X @ R
    Y = opq_decode_np(encode_codes_np(Xr, books), books)
    return float(((Xr - Y) ** 2).sum())


def test_rotation_is_orthogonal_and_reduces_error():
    ids, X = _correlated()
    m, ks = 4, 16
    R, books = opq_fit_arrays(ids, X, m, ks, opq_iters=5, pq_iters=3)
    np.testing.assert_allclose(R.T @ R, np.eye(X.shape[1]), atol=1e-10)
    # plain PQ = OPQ with zero rotation iterations
    R0, books0 = opq_fit_arrays(ids, X, m, ks, opq_iters=0, pq_iters=3)
    np.testing.assert_array_equal(R0, np.eye(X.shape[1]))
    err_pq = _recon_err(X, R0, books0, m)
    err_opq = _recon_err(X, R, books, m)
    assert err_opq < err_pq * 0.9  # the objective OPQ minimizes


def test_opq_iters_zero_books_equal_plain_pq():
    ids, X = _correlated(n=120, d=8, seed=3)
    _, books0 = opq_fit_arrays(ids, X, 2, 8, opq_iters=0, pq_iters=4)
    books_pq = pq_fit_arrays(ids, X, 2, 8, max_iter=4)
    np.testing.assert_array_equal(books0, books_pq)


def test_identity_rotation_delegates_to_pq(spark):
    """opq_knn with a forced identity model must reproduce pq_knn
    row-for-row — pins the rotation plumbing as a pure pre-pass."""
    from vectordbindexing_spark.operators.pq import pq_knn

    ids, X = _correlated(n=150, d=8, seed=5)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(len(ids))]
    df = spark.createDataFrame(rows, schema="id long, vec array<double>")
    q = df.filter(F.col("id") % 10 == 0)
    b = df.filter(F.col("id") % 10 != 0)
    books = pq_fit_arrays(ids[ids % 10 != 0], X[ids % 10 != 0], 2, 8, 3)
    via_pq = pq_knn(
        q, b, k=5, q_id="id", q_vec="vec", b_id="id", b_vec="vec",
        codebooks=books,
    )
    via_opq = opq_knn(
        q, b, k=5, q_id="id", q_vec="vec", b_id="id", b_vec="vec",
        model=(np.eye(8), books),
    )
    left = [
        (r["qid"], r["nbr_rank"], r["neighbor_id"], round(r["dist"], 9))
        for r in via_opq.orderBy("qid", "nbr_rank").collect()
    ]
    right = [
        (r["qid"], r["nbr_rank"], r["neighbor_id"], round(r["dist"], 9))
        for r in via_pq.orderBy("qid", "nbr_rank").collect()
    ]
    assert left == right


def test_opq_recall_on_correlated_data(spark):
    """End-to-end distributed OPQ recall floor, and not worse than plain
    PQ on the same (correlated) corpus."""
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.pq import pq_knn

    ids, X = _correlated(n=300, d=16, seed=7)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(len(ids))]
    df = spark.createDataFrame(rows, schema="id long, vec array<double>")
    q = df.filter(F.col("id") % 10 == 0)
    b = df.filter(F.col("id") % 10 != 0)
    exact = {
        (r["qid"], r["neighbor_id"])
        for r in exact_knn(
            q, b, k=5, metric="l2", q_id="id", q_vec="vec",
            b_id="id", b_vec="vec",
        ).collect()
    }

    def recall(res):
        got = {(r["qid"], r["neighbor_id"]) for r in res.collect()}
        return len(exact & got) / len(exact)

    r_pq = recall(
        pq_knn(q, b, k=5, m=4, ks=16, max_iter=3,
               q_id="id", q_vec="vec", b_id="id", b_vec="vec")
    )
    r_opq = recall(
        opq_knn(q, b, k=5, m=4, ks=16, opq_iters=4, pq_iters=3,
                q_id="id", q_vec="vec", b_id="id", b_vec="vec")
    )
    assert r_opq >= 0.5
    assert r_opq >= r_pq - 0.05  # never meaningfully worse


def test_oracle_parity_duckdb(spark, sf_dir):
    duckdb = pytest.importorskip("duckdb")
    import os

    import __spark_entry__ as entry
    from vectordbindexing_spark import oracles

    sdf = entry.queries()["opq_knn"](spark, sf_dir)
    srows = sorted(
        (r["qid"], r["nbr_rank"], r["neighbor_id"], r["dist"])
        for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}')"
    )
    orows = sorted(
        (int(a), int(b), int(c), float(d))
        for a, b, c, d in con.execute(
            oracles.opq_knn_sql(m=8, ks=16, k=10, opq_iters=3, pq_iters=3)
        ).fetchall()
    )
    assert srows == orows
