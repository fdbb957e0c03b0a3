"""Triangle counts / clustering coefficient / k-core: hand-computed
pins, python brute-force parity, DuckDB replays (VALUES + the real
embeddings kNN graph staged for the r08 contract queries)."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark import oracles
from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.graph import knn_graph, mutualize
from vectordbindexing_spark.operators.triangles import kcore, triangle_counts

# K4 on {0,1,2,3} plus pendant 5-0, with a duplicate and a reversed dup
K4P = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 5),
       (1, 0), (2, 3)]


def _adj(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def _py_triangles(edges):
    adj = _adj(edges)
    out = {}
    for v, nb in adj.items():
        d = len(nb)
        ns = sorted(nb)
        t = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if ns[j] in adj[ns[i]]
        )
        out[v] = (d, t, 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0)
    return out


def _py_kcore(edges, k):
    adj = _adj(edges)
    while True:
        drop = [v for v, nb in adj.items() if len(nb) < k]
        if not drop:
            return {v: len(nb) for v, nb in adj.items()}
        for v in drop:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]


def test_triangles_k4_pendant_pins(spark):
    df = spark.createDataFrame(K4P, "src long, dst long")
    got = {r["id"]: (r["degree"], r["triangles"], r["clustering"])
           for r in triangle_counts(df).collect()}
    assert got[0] == (4, 3, 0.5)
    for v in (1, 2, 3):
        assert got[v] == (3, 3, 1.0)
    assert got[5] == (1, 0, 0.0)


def test_triangles_python_parity(spark):
    # deterministic pseudo-random graph: 60 nodes, quadratic-probe edges
    edges = [(i, (i * i + 3 * i + 1) % 60) for i in range(60)]
    edges += [(i, (i + 7) % 60) for i in range(60)]
    edges += [(i, (2 * i + 11) % 60) for i in range(0, 60, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: (r["degree"], r["triangles"], r["clustering"])
           for r in triangle_counts(df).collect()}
    want = _py_triangles(edges)
    assert set(got) == set(want)
    for v, (d, t, cc) in want.items():
        assert got[v][0] == d and got[v][1] == t, v
        assert got[v][2] == pytest.approx(cc, abs=1e-6), v


def test_triangles_duckdb_replay_values(spark):
    edges = [(i, (i * i + 3 * i + 1) % 40) for i in range(40)]
    edges += [(i, (i + 5) % 40) for i in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    srows = sorted(tuple(r) for r in triangle_counts(df).collect())
    vals = ", ".join(f"({u}, {v})" for u, v in edges)
    sql = oracles.triangle_counts_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)"
    )
    con = duckdb.connect()
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows and len(srows) == 40


def test_kcore_pins(spark):
    # K4 + chain 3-6-7-8: 2-core strips the chain, keeps K4
    edges = K4P + [(3, 6), (6, 7), (7, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["core_degree"] for r in kcore(df, k=2).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    got3 = {r["id"]: r["core_degree"] for r in kcore(df, k=3).collect()}
    assert got3 == {0: 3, 1: 3, 2: 3, 3: 3}
    assert kcore(df, k=5).count() == 0


def test_kcore_python_parity_and_replay(spark):
    edges = [(i, (i * i + 3 * i + 1) % 50) for i in range(50)]
    edges += [(i, (i + 9) % 50) for i in range(50)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["core_degree"] for r in kcore(df, k=3).collect()}
    assert got == _py_kcore(edges, 3)
    vals = ", ".join(f"({u}, {v})" for u, v in edges)
    sql = oracles.kcore_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", k=3
    )
    con = duckdb.connect()
    drows = {r[0]: r[1] for r in con.sql(sql).fetchall()}
    assert got == drows


def test_kcore_validation(spark):
    df = spark.createDataFrame(K4P, "src long, dst long")
    with pytest.raises(ValueError):
        kcore(df, k=0)
    with pytest.raises(ValueError):
        kcore(df, k=2, max_rounds=0)


def _knn_edges(spark, sf_dir, k=8, max_degree=12, id_limit=1200):
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < id_limit
    )
    g = knn_graph(emb, k=k, metric="cosine", id_col="vec_id",
                  vec_col="embedding")
    return mutualize(g, max_degree=max_degree).select("src", "dst")


def test_triangles_duckdb_replay_knn_graph(spark, sf_dir):
    """The exact comparison the r08 contract query will run: triangle
    stats of the capped mutual-kNN graph over the embeddings slice."""
    srows = sorted(
        tuple(r) for r in triangle_counts(_knn_edges(spark, sf_dir)).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    sql = oracles.triangle_counts_sql(oracles.knn_mutual_edges_cte())
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows
    assert len(srows) > 100
    # a kNN graph is locally dense — triangles must actually exist
    assert sum(r[2] for r in srows) > 0


def test_kcore_duckdb_replay_knn_graph(spark, sf_dir):
    srows = sorted(
        tuple(r)
        for r in kcore(_knn_edges(spark, sf_dir), k=4).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    sql = oracles.kcore_sql(oracles.knn_mutual_edges_cte(), k=4)
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows and len(srows) > 50
