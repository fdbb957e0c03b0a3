"""Personalized PageRank: hand-pins, python parity, seed-mass
properties, DuckDB replays (VALUES + real kNN graph staged for r08)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark import oracles
from vectordbindexing_spark.operators.pagerank import personalized_pagerank

EDGES = [(1, 2), (2, 3), (3, 1), (4, 1), (1, 3), (2, 1)]


def _py_ppr(edges, seeds, iters=3, d=0.85):
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    srcs = {u for u, _ in e}
    e += [(v, v) for v in nodes if v not in srcs]
    out = {}
    for u, v in e:
        out.setdefault(u, []).append(v)
    S = sorted(set(seeds) & set(nodes))
    r = {v: (1.0 / len(S) if v in S else 0.0) for v in nodes}
    for _ in range(iters):
        inc = {v: 0.0 for v in nodes}
        for u in sorted(out):
            c = r[u] / len(out[u])
            for v in out[u]:
                inc[v] += c
        r = {
            v: (1 - d) * (1.0 / len(S) if v in S else 0.0) + d * inc[v]
            for v in nodes
        }
    return {v: round(r[v] * len(S), 6) for v in nodes}


def _dfs(spark, seeds):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    return e, s


def test_ppr_python_parity(spark):
    e, s = _dfs(spark, [1, 4])
    got = {r["id"]: r["rank_x_s"]
           for r in personalized_pagerank(e, s, iters=3).collect()}
    want = _py_ppr(EDGES, [1, 4], iters=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v


def test_ppr_unreachable_is_exactly_zero(spark):
    # 4 -> 1 only; nothing points to 4, seed elsewhere
    e, s = _dfs(spark, [2])
    got = {r["id"]: (r["rank_x_s"], r["is_seed"])
           for r in personalized_pagerank(e, s, iters=4).collect()}
    assert got[4] == (0.0, 0)
    assert got[2][1] == 1 and got[2][0] > 0


def test_ppr_seeds_outside_graph_ignored(spark):
    e, s1 = _dfs(spark, [1])
    _, s2 = _dfs(spark, [1, 999])  # 999 not a node
    a = sorted(tuple(r) for r in personalized_pagerank(e, s1, iters=2).collect())
    b = sorted(tuple(r) for r in personalized_pagerank(e, s2, iters=2).collect())
    assert a == b


def test_ppr_duckdb_replay_values(spark):
    e, s = _dfs(spark, [1, 4])
    srows = sorted(
        tuple(r) for r in personalized_pagerank(e, s, iters=3).collect()
    )
    vals = ", ".join(f"({u}, {v})" for u, v in EDGES)
    sql = oracles.personalized_pagerank_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)",
        "SELECT * FROM (VALUES (1), (4)) t(id)",
        iters=3,
    )
    con = duckdb.connect()
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows


def test_ppr_validation(spark):
    e, s = _dfs(spark, [1])
    with pytest.raises(ValueError):
        personalized_pagerank(e, s, iters=0)


def test_ppr_duckdb_replay_knn_graph(spark, sf_dir):
    """The exact comparison the r08 contract query will run: PPR from
    the label-0 seed vectors over the mutual kNN graph."""
    import __spark_entry__ as e

    srows = sorted(
        tuple(r) for r in e._graph_ppr(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    sql = oracles.personalized_pagerank_sql(
        oracles.knn_mutual_edges_cte(),
        "SELECT vec_id AS id FROM embeddings WHERE label = 0",
        iters=3,
    )
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows and len(srows) > 100
    # seed-proximity signal: seed nodes outrank the median node
    seed_ranks = [r[1] for r in srows if r[3] == 1]
    all_ranks = sorted(r[1] for r in srows)
    median = all_ranks[len(all_ranks) // 2]
    assert sum(1 for x in seed_ranks if x > median) > len(seed_ranks) // 2
