"""Fixed-round Lloyd's k-means: hand pins, python parity, the DuckDB
replay behind the r09 contract query, empty-cluster carry, and the
exact_mean auto-switch."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark import oracles
from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.kmeans import kmeans


def _h(i):
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)


def _py_kmeans(pts, k, iters):
    """Independent dict-based reference, same determinism contract."""
    seeds = sorted(pts, key=lambda p: (_h(p[0]), p[0]))[:k]
    cents = {c: list(v) for c, (_, v) in enumerate(seeds)}

    def sq(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign():
        out = {}
        for i, v in pts:
            out[i] = min((sq(v, cv), c) for c, cv in cents.items())
        return out

    for _ in range(iters):
        asg = assign()
        sums, cnt = {}, {}
        for i, v in pts:
            c = asg[i][1]
            cnt[c] = cnt.get(c, 0) + 1
            if c in sums:
                sums[c] = [a + b for a, b in zip(sums[c], v)]
            else:
                sums[c] = list(v)
        for c in cents:
            if c in sums:
                cents[c] = [x / cnt[c] for x in sums[c]]
    asg = assign()
    return {i: (c, round(d, 6)) for i, (d, c) in asg.items()}


PTS = [
    (0, [0.0, 0.0]),
    (1, [0.1, 0.0]),
    (2, [0.0, 0.1]),
    (3, [5.0, 5.0]),
    (4, [5.1, 5.0]),
    (5, [5.0, 5.1]),
    (6, [10.0, 0.0]),
]


def _df(spark, pts=PTS):
    return spark.createDataFrame(pts, "id long, vec array<double>")


def test_kmeans_separates_obvious_clusters(spark):
    rows = {r["id"]: r["cluster"] for r in kmeans(_df(spark), k=3, iters=3).collect()}
    assert rows[0] == rows[1] == rows[2]
    assert rows[3] == rows[4] == rows[5]
    assert rows[6] not in (rows[0], rows[3])
    assert len({rows[0], rows[3], rows[6]}) == 3


def test_kmeans_python_parity(spark):
    got = {
        r["id"]: (r["cluster"], r["dist"])
        for r in kmeans(_df(spark), k=3, iters=3).collect()
    }
    want = _py_kmeans(PTS, k=3, iters=3)
    assert got == want


def test_kmeans_duckdb_replay_real_embeddings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    got = sorted(
        tuple(r)
        for r in kmeans(
            emb, k=8, iters=3, id_col="vec_id", vec_col="embedding"
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            oracles.kmeans_sql(
                "SELECT vec_id AS id, embedding::DOUBLE[] AS v "
                "FROM embeddings WHERE vec_id < 400",
                k=8, iters=3,
            )
        ).fetchall()
    )
    assert got == want and len(got) == 400


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """A seed that never wins any point must survive every round with
    its original centroid instead of vanishing or going NULL."""
    # id 6 ([10, 0]) is the lone far point; with k=4 some seed can lose
    # all members after round 1 — every point must still get exactly
    # one cluster and k distinct centroids must remain addressable
    out = kmeans(_df(spark), k=4, iters=4).collect()
    assert len(out) == len(PTS)
    assert all(r["dist"] is not None and r["dist"] >= 0 for r in out)
    want = _py_kmeans(PTS, k=4, iters=4)
    got = {r["id"]: (r["cluster"], r["dist"]) for r in out}
    assert got == want


def test_kmeans_exact_mean_auto_switch(spark, monkeypatch):
    import vectordbindexing_spark.operators.kmeans as km

    df = _df(spark)
    auto = sorted(tuple(r) for r in km.kmeans(df, k=3, iters=2).collect())
    fold = sorted(
        tuple(r)
        for r in km.kmeans(df, k=3, iters=2, exact_mean=True).collect()
    )
    assert auto == fold  # small input -> fold chosen

    monkeypatch.setattr(km, "KMEANS_FOLD_CELL_LIMIT", 1)
    low = sorted(tuple(r) for r in km.kmeans(df, k=3, iters=2).collect())
    avg = sorted(
        tuple(r)
        for r in km.kmeans(df, k=3, iters=2, exact_mean=False).collect()
    )
    assert low == avg == fold  # round-6 output equal on this data


def test_kmeans_validation(spark):
    with pytest.raises(ValueError):
        kmeans(_df(spark), k=0)
    with pytest.raises(ValueError):
        kmeans(_df(spark), iters=0)
