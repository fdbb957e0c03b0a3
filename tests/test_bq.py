"""Binary-quantization contract: packing round-trip, Hamming kernel vs
a bit-string reference, full-shortlist rerank ≡ exact, recall floor,
and Spark↔DuckDB parity for the no-literal oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.bq import (
    _popcount,
    bq_encode_np,
    bq_knn,
)


def test_popcount_lut_matches_python():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**32, size=100, dtype=np.int64)
    expect = np.array([bin(int(x)).count("1") for x in a])
    np.testing.assert_array_equal(_popcount(a), expect)


def test_encode_pack_roundtrip():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(40, 70))  # 70 dims → 3 words, last partial
    thr = np.zeros(70)
    W = bq_encode_np(X, thr)
    assert W.shape == (40, 3)
    assert (W >= 0).all()
    for i in range(40):
        for d in range(70):
            bit = (W[i, d // 32] >> (d % 32)) & 1
            assert bit == int(X[i, d] >= 0.0)


def test_hamming_equals_sign_disagreements():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(20, 64))
    Y = rng.normal(size=(15, 64))
    thr = np.zeros(64)
    WX, WY = bq_encode_np(X, thr), bq_encode_np(Y, thr)
    ham = np.zeros((20, 15), dtype=np.int64)
    for w in range(WX.shape[1]):
        ham += _popcount(WX[:, w : w + 1] ^ WY[None, :, w])
    expect = ((X[:, None, :] >= 0) != (Y[None, :, :] >= 0)).sum(axis=2)
    np.testing.assert_array_equal(ham, expect)


def _vec_df(spark, n=200, d=32, seed=9):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(
        rows, schema="id long, vec array<double>"
    )


def test_full_shortlist_rerank_equals_exact(spark):
    from vectordbindexing_spark.operators.exact_knn import exact_knn

    df = _vec_df(spark)
    q = df.filter(F.col("id") % 10 == 0)
    b = df.filter(F.col("id") % 10 != 0)
    exact = exact_knn(q, b, k=8, metric="l2", q_id="id", q_vec="vec",
                      b_id="id", b_vec="vec")
    full = bq_knn(q, b, k=8, shortlist=b.count(),
                  q_id="id", q_vec="vec", b_id="id", b_vec="vec")
    left = [
        (r["qid"], r["nbr_rank"], r["neighbor_id"], round(r["dist"], 9))
        for r in full.orderBy("qid", "nbr_rank").collect()
    ]
    right = [
        (r["qid"], r["nbr_rank"], r["neighbor_id"], round(r["dist"], 9))
        for r in exact.orderBy("qid", "nbr_rank").collect()
    ]
    assert left == right


def test_recall_floor_with_modest_shortlist(spark):
    from vectordbindexing_spark.operators.exact_knn import exact_knn

    df = _vec_df(spark, n=300, d=64, seed=4)
    q = df.filter(F.col("id") % 10 == 0)
    b = df.filter(F.col("id") % 10 != 0)
    exact = {
        (r["qid"], r["neighbor_id"])
        for r in exact_knn(q, b, k=5, metric="l2", q_id="id",
                           q_vec="vec", b_id="id", b_vec="vec").collect()
    }
    got = {
        (r["qid"], r["neighbor_id"])
        for r in bq_knn(q, b, k=5, shortlist=60, q_id="id", q_vec="vec",
                        b_id="id", b_vec="vec").collect()
    }
    assert len(exact & got) / len(exact) >= 0.6


def test_oracle_parity_single_partition(spark, sf_dir):
    """Regression for the per-batch tie-truncation hole: with the whole
    encoded base in ONE Arrow batch (batch size > shortlist, so the
    per-batch cut actually engages) the output must still match the
    oracle exactly. Before the exact (dist, id) batch selection this
    diverged on 113/500 rows — integer Hamming distances tie constantly
    and argpartition kept tied candidates by batch position."""
    duckdb = pytest.importorskip("duckdb")
    import os
    from unittest import mock

    import vectordbindexing_spark.plans.partitioning as pt

    import __spark_entry__ as entry
    from vectordbindexing_spark import oracles

    with mock.patch.object(
        pt, "repartition_for_compute", lambda df, *a, **k: df.coalesce(1)
    ):
        sdf = entry.queries()["bq_hamming_knn"](spark, sf_dir)
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
            oracles.bq_knn_sql(k=10, shortlist=60)
        ).fetchall()
    )
    assert srows == orows


def test_batch_topk_tie_break_is_lowest_id():
    """The shared batch selector must keep the LOWEST ids among equal
    distances even when the tie group straddles the cut."""
    import numpy as np

    from vectordbindexing_spark.operators.topk import batch_topk_by_dist_id

    D = np.array([[1.0, 0.0, 0.0, 0.0, 2.0]])
    ids = np.array([50, 40, 30, 20, 10])
    nbr, dist = batch_topk_by_dist_id(D, ids, 2)
    assert nbr.tolist() == [[20, 30]]  # not whichever argpartition kept
    assert dist.tolist() == [[0.0, 0.0]]


def test_oracle_parity_duckdb(spark, sf_dir):
    duckdb = pytest.importorskip("duckdb")
    import os

    import __spark_entry__ as entry
    from vectordbindexing_spark import oracles

    sdf = entry.queries()["bq_hamming_knn"](spark, sf_dir)
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
            oracles.bq_knn_sql(k=10, shortlist=60)
        ).fetchall()
    )
    assert srows == orows


def test_batch_topk_hybrid_matches_full_sort():
    """The O(n) hybrid selection (argpartition + boundary-tie fill) must
    equal the full stable-sort reference on tie-heavy integer distances
    (the BQ Hamming regime) and on float distances, for every kk
    including kk ≥ n."""
    import numpy as np

    from vectordbindexing_spark.operators.topk import batch_topk_by_dist_id

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(3, 40))
        rows = int(rng.integers(1, 6))
        if trial % 2 == 0:
            D = rng.integers(0, 4, size=(rows, n)).astype(np.float64)
        else:
            D = np.round(rng.random((rows, n)), 1)
        ids = rng.permutation(1000)[:n].astype(np.int64)
        for kk in (1, 2, n // 2 or 1, n - 1, n, n + 3):
            nbr, dist = batch_topk_by_dist_id(D, ids, kk)
            order = np.argsort(ids, kind="stable")
            Do = D[:, order]
            sel = np.argsort(Do, axis=1, kind="stable")[:, :kk]
            assert nbr.tolist() == ids[order][sel].tolist(), (trial, kk)
            assert (
                dist.tolist()
                == np.take_along_axis(Do, sel, axis=1).tolist()
            ), (trial, kk)
