"""Deterministic random walks: structural invariants, python parity
(md5 choice replayed), DuckDB replays (VALUES + real kNN graph, staged
for r08)."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

from vectordbindexing_spark import oracles
from vectordbindexing_spark.functions.hashing import det_hash64_py
from vectordbindexing_spark.operators.walks import random_walks

EDGES = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5)]


def _adj(edges):
    adj = defaultdict(set)
    for a, b in {tuple(sorted(e)) for e in edges if e[0] != e[1]}:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def _py_walks(edges, walk_len, wpn):
    adj = _adj(edges)
    out = {}
    for n in adj:
        for w in range(wpn):
            wid = n * wpn + w
            cur = n
            out[(wid, 0)] = cur
            for t in range(1, walk_len + 1):
                nbrs = sorted(adj[cur])
                idx = det_hash64_py(f"{wid}:{t}:{cur}") % len(nbrs)
                cur = nbrs[idx]
                out[(wid, t)] = cur
    return out


def test_walks_python_parity(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r["walk_id"], r["step"]): r["node"]
           for r in random_walks(df, walk_len=5, walks_per_node=2).collect()}
    assert got == _py_walks(EDGES, 5, 2)


def test_walks_structure(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    rows = random_walks(df, walk_len=4).collect()
    adj = _adj(EDGES)
    walks = defaultdict(dict)
    for r in rows:
        walks[r["walk_id"]][r["step"]] = r["node"]
    assert len(walks) == 5  # one per node
    for wid, steps in walks.items():
        assert sorted(steps) == list(range(5))  # complete, no gaps
        assert steps[0] == wid  # walks_per_node=1 -> walk_id = start
        for t in range(1, 5):
            assert steps[t] in adj[steps[t - 1]]  # only real edges


def test_walks_duckdb_replay_values(spark):
    edges = [(i, (i * i + 3 * i + 1) % 30) for i in range(30)]
    edges += [(i, (i + 4) % 30) for i in range(30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    srows = sorted(
        tuple(r)
        for r in random_walks(df, walk_len=6, walks_per_node=2).collect()
    )
    vals = ", ".join(f"({u}, {v})" for u, v in edges)
    sql = oracles.random_walks_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)",
        walk_len=6, walks_per_node=2,
    )
    con = duckdb.connect()
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows and len(srows) == 30 * 2 * 7


def test_walks_validation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        random_walks(df, walk_len=0)
    with pytest.raises(ValueError):
        random_walks(df, walks_per_node=0)


def test_walks_duckdb_replay_knn_graph(spark, sf_dir):
    """The exact comparison the r08 contract query will run: 6-step
    walks over the mutual kNN graph of the real embeddings."""
    from test_triangles import _knn_edges

    srows = sorted(
        tuple(r)
        for r in random_walks(
            _knn_edges(spark, sf_dir), walk_len=6
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    sql = oracles.random_walks_sql(oracles.knn_mutual_edges_cte(), walk_len=6)
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows
    assert len(srows) == 500 * 7
