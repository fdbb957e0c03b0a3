"""SQ8 scalar-quantization contract: encode bounds, decode error,
recall floor, full-shortlist rerank ≡ exact, and Spark↔DuckDB parity
for the no-literal oracle (the whole fit/encode/decode pipeline is
replayed in SQL, so this is algorithm-independent truth)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.sq import (
    _sq8_params,
    sq8_decode_np,
    sq8_encode,
    sq8_encode_np,
    sq8_fit,
    sq8_knn,
)


def _vec_df(spark, n=160, d=12, seed=7, constant_dim=False):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)) * rng.uniform(0.5, 3.0, size=d)
    if constant_dim:
        X[:, 0] = 1.25
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, schema="id long, vec array<double>"),
        X,
    )


def test_fit_matches_numpy_and_encode_bounds(spark):
    df, X = _vec_df(spark, constant_dim=True)
    mins, maxs = sq8_fit(df)
    np.testing.assert_array_equal(mins, X.min(axis=0))
    np.testing.assert_array_equal(maxs, X.max(axis=0))
    scales, invs = _sq8_params(mins, maxs)
    codes = sq8_encode_np(X, mins, scales)
    assert codes.min() >= 0 and codes.max() <= 255
    # extremes hit the endpoints on varying dims
    assert codes[np.argmin(X[:, 1]), 1] == 0
    assert codes[np.argmax(X[:, 1]), 1] == 255
    # constant dim: code 0, decode == the constant exactly
    assert (codes[:, 0] == 0).all()
    dec = sq8_decode_np(codes, mins, invs)
    np.testing.assert_array_equal(dec[:, 0], X[:, 0])
    # quantization error bounded by half a step per dim
    step = (maxs - mins) / 255.0
    assert (np.abs(dec - X) <= step / 2 + 1e-12).all()


def test_encode_dataframe_roundtrip(spark):
    df, X = _vec_df(spark, n=64)
    mins, maxs = sq8_fit(df)
    enc = sq8_encode(df, mins, maxs).orderBy("id").collect()
    scales, _ = _sq8_params(mins, maxs)
    expect = sq8_encode_np(X, mins, scales)
    got = np.stack([np.asarray(r["codes"]) for r in enc])
    np.testing.assert_array_equal(got, expect)


def test_knn_recall_and_full_rerank_equals_exact(spark):
    from vectordbindexing_spark.operators.exact_knn import exact_knn

    df, _ = _vec_df(spark, n=200, d=16, seed=3)
    q = df.filter(F.col("id") % 10 == 0)
    b = df.filter(F.col("id") % 10 != 0)
    exact = exact_knn(
        q, b, k=10, metric="l2", q_id="id", q_vec="vec",
        b_id="id", b_vec="vec",
    )
    approx = sq8_knn(q, b, k=10, q_id="id", q_vec="vec",
                     b_id="id", b_vec="vec")
    e = {(r["qid"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["qid"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9  # 8-bit quantization barely moves top-10 sets
    # full-width rerank must reproduce the exact result row-for-row
    rer = sq8_knn(
        q, b, k=10, q_id="id", q_vec="vec", b_id="id", b_vec="vec",
        rerank=b.count(),
    )
    left = [
        (r["qid"], r["nbr_rank"], r["neighbor_id"], round(r["dist"], 9))
        for r in rer.orderBy("qid", "nbr_rank").collect()
    ]
    right = [
        (r["qid"], r["nbr_rank"], r["neighbor_id"], round(r["dist"], 9))
        for r in exact.orderBy("qid", "nbr_rank").collect()
    ]
    assert left == right


def test_null_vectors_excluded(spark):
    rows = [(0, [0.0, 1.0]), (1, None), (2, [2.0, 3.0]), (3, [0.5, 1.5])]
    df = spark.createDataFrame(rows, schema="id long, vec array<double>")
    mins, maxs = sq8_fit(df)
    assert mins.shape == (2,)
    out = sq8_knn(
        df.filter(F.col("id") == 0), df, k=4,
        q_id="id", q_vec="vec", b_id="id", b_vec="vec",
    ).collect()
    assert {r["neighbor_id"] for r in out} == {0, 2, 3}


def test_plan_knn_recall_target_routes_sq8():
    import vectordbindexing_spark.plans.knn_planner as kp

    common = dict(approximate_ok=True, repeated_queries=True,
                  memory_tight=True)
    assert kp.plan_knn(100, 5_000_000, 10, **common).strategy == "ivfpq"
    assert kp.plan_knn(
        100, 5_000_000, 10, recall_target=0.5, **common
    ).strategy == "ivfpq"
    p = kp.plan_knn(100, 5_000_000, 10, recall_target=0.95, **common)
    assert p.strategy == "sq8"
    assert p.params["rerank"] >= 40
    # without memory pressure the full-precision IVF still wins
    assert kp.plan_knn(
        100, 5_000_000, 10, approximate_ok=True, repeated_queries=True,
        recall_target=0.95,
    ).strategy == "ivf"


def test_planner_sq8_route_executes_and_rescales_cosine(spark, monkeypatch):
    """Planner-dispatched cosine→sq8 must rank like sq8_knn on
    pre-unit-normalized input and return cosine-scale distances
    (dist² / 2 of the rotated L2), matching every other route."""
    import numpy as np

    import vectordbindexing_spark.plans.knn_planner as kp
    from vectordbindexing_spark.functions.vector import unit_norm

    monkeypatch.setattr(kp, "EXACT_BASE_LIMIT", 10)
    df, _ = _vec_df(spark, n=120, d=8, seed=21)
    q = df.filter(F.col("id") % 10 == 0).localCheckpoint(eager=True)
    b = df.filter(F.col("id") % 10 != 0)
    routed = kp.knn(
        q, b, k=5, metric="cosine", approximate_ok=True,
        repeated_queries=True, memory_tight=True, recall_target=0.95,
        q_id="id", q_vec="vec", b_id="id", b_vec="vec",
    ).toPandas()
    qn = q.withColumn("vec", unit_norm("vec"))
    bn = b.withColumn("vec", unit_norm("vec"))
    direct = sq8_knn(
        qn, bn, k=5, rerank=50, q_id="id", q_vec="vec",
        b_id="id", b_vec="vec",
    ).toPandas()
    key = ["qid", "nbr_rank"]
    routed = routed.sort_values(key).reset_index(drop=True)
    direct = direct.sort_values(key).reset_index(drop=True)
    assert routed["neighbor_id"].tolist() == direct["neighbor_id"].tolist()
    np.testing.assert_allclose(
        routed["dist"].to_numpy(),
        direct["dist"].to_numpy() ** 2 / 2,
    )


def test_oracle_parity_duckdb(spark, sf_dir):
    """The t2 gate in miniature: Spark sq8_knn vs the no-literal DuckDB
    replay at the test scale factor."""
    duckdb = pytest.importorskip("duckdb")
    import os

    import __spark_entry__ as entry
    from vectordbindexing_spark import oracles

    sdf = entry.queries()["sq8_knn"](spark, sf_dir)
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
        for a, b, c, d in con.execute(oracles.sq8_knn_sql(k=10)).fetchall()
    )
    assert srows == orows
