"""Clamped fixed-round label propagation: hand pins, python parity,
DuckDB replays (VALUES + the real embeddings kNN graph with the
embeddings.label column as seeds — staged for the r08 contract)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark import oracles
from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.labelprop import label_propagation

# two chains meeting at an unlabeled middle: 0-1-2-3-4 with seeds at
# the ends, plus an isolated pair 8-9 with no labeled neighbor
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (8, 9)]
SEEDS = [(0, 10), (4, 20)]


def _adj(edges):
    adj = defaultdict(set)
    for a, b in {tuple(sorted(e)) for e in edges if e[0] != e[1]}:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def _py_lp(edges, seeds, iters):
    adj = _adj(edges)
    sd = dict(seeds)
    lab = {v: sd.get(v, -1) for v in adj}
    for _ in range(iters):
        new = {}
        for v in adj:
            if v in sd:
                new[v] = sd[v]
                continue
            cnt = Counter(lab[u] for u in adj[v] if lab[u] >= 0)
            if cnt:
                new[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            else:
                new[v] = lab[v]
        lab = new
    return lab


def _dfs(spark, edges=EDGES, seeds=SEEDS):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame(seeds, "id long, label long")
    return e, s


def test_lp_hand_pins(spark):
    e, s = _dfs(spark)
    got = {r["id"]: (r["label"], r["is_seed"])
           for r in label_propagation(e, s, iters=2).collect()}
    # 2 rounds: 1 and 3 labeled round 1; 2 sees both 10 and 20 round 2
    # (tie, one vote each) -> smallest label wins
    assert got[0] == (10, 1) and got[4] == (20, 1)
    assert got[1][0] == 10 and got[3][0] == 20
    assert got[2][0] == 10  # tie -> smallest
    assert got[8] == (-1, 0) and got[9] == (-1, 0)


@pytest.mark.parametrize("iters", [1, 3])
def test_lp_python_parity(spark, iters):
    edges = [(i, (i * i + 3 * i + 1) % 60) for i in range(60)]
    edges += [(i, (i + 7) % 60) for i in range(60)]
    seeds = [(i, (i % 3) * 100) for i in range(0, 60, 10)]
    e, s = _dfs(spark, edges, seeds)
    got = {r["id"]: r["label"]
           for r in label_propagation(e, s, iters=iters).collect()}
    assert got == _py_lp(edges, seeds, iters)


def test_lp_duckdb_replay_values(spark):
    edges = [(i, (i * i + 3 * i + 1) % 40) for i in range(40)]
    seeds = [(i, (i % 4) * 7) for i in range(0, 40, 5)]
    e, s = _dfs(spark, edges, seeds)
    srows = sorted(tuple(r) for r in label_propagation(e, s, iters=3).collect())
    ev = ", ".join(f"({u}, {v})" for u, v in edges)
    sv = ", ".join(f"({i}, {l})" for i, l in seeds)
    sql = oracles.label_propagation_sql(
        f"SELECT * FROM (VALUES {ev}) t(src, dst)",
        f"SELECT * FROM (VALUES {sv}) t(id, label)",
        iters=3,
    )
    con = duckdb.connect()
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows and len(srows) == 40


def test_lp_validation(spark):
    e, s = _dfs(spark)
    with pytest.raises(ValueError):
        label_propagation(e, s, iters=0)


def test_lp_duckdb_replay_knn_graph(spark, sf_dir):
    """The exact comparison the r08 contract query will run: propagate
    the embeddings table's label column from the vec_id % 5 == 0 seed
    subset over the capped mutual-kNN graph, 3 rounds."""
    from test_triangles import _knn_edges

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = emb.where(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("id"), "label"
    )
    srows = sorted(
        tuple(r)
        for r in label_propagation(
            _knn_edges(spark, sf_dir), seeds, iters=3
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    sql = oracles.label_propagation_sql(
        oracles.knn_mutual_edges_cte(),
        "SELECT vec_id AS id, label FROM embeddings WHERE vec_id % 5 = 0",
        iters=3,
    )
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows and len(srows) > 100
    # propagation must actually reach non-seeds
    labeled_nonseed = sum(1 for r in srows if r[1] >= 0 and r[2] == 0)
    assert labeled_nonseed > 0
