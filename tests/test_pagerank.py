"""PageRank: hand-computed pins, python parity, dangling repair,
mass conservation, and the DuckDB replay staged for r08."""

from __future__ import annotations

import duckdb
import pytest

from vectordbindexing_spark import oracles
from vectordbindexing_spark.operators.pagerank import pagerank


def _py_pagerank(edges, iters=3, d=0.85):
    """Independent reference (dict-based), same self-loop repair."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    srcs = {u for u, _ in e}
    e += [(v, v) for v in nodes if v not in srcs]
    out = {}
    for u, v in e:
        out.setdefault(u, []).append(v)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        inc = {v: 0.0 for v in nodes}
        for u in sorted(out):  # source-ordered accumulation
            c = r[u] / len(out[u])
            for v in out[u]:
                inc[v] += c
        r = {v: (1.0 - d) / n + d * inc[v] for v in nodes}
    return {v: round(r[v] * n, 6) for v in nodes}


EDGES = [(1, 2), (2, 3), (3, 1), (4, 1), (1, 3), (2, 1)]


def test_pagerank_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["id"]: r["rank_x_n"] for r in pagerank(df, iters=3).collect()}
    want = _py_pagerank(EDGES, iters=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v


def test_pagerank_mass_conserved_and_dangling(spark):
    # node 4 dangles (no out-edges) -> self-loop repair keeps total mass
    df = spark.createDataFrame([(1, 4), (2, 4), (3, 4)], "src long, dst long")
    rows = pagerank(df, iters=4).collect()
    got = {r["id"]: (r["rank_x_n"], r["out_deg"]) for r in rows}
    assert sum(v for v, _ in got.values()) == pytest.approx(4.0, abs=1e-5)
    # the sink accumulates, the sources stay at the teleport floor
    assert got[4][0] > 1.0 and got[4][1] == 1  # repaired self-loop
    assert got[1][0] == pytest.approx(0.15, abs=1e-6)


def test_pagerank_hub_outranks_leaves(spark):
    star = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    df = spark.createDataFrame(star, "src long, dst long")
    got = {r["id"]: r["rank_x_n"] for r in pagerank(df, iters=3).collect()}
    assert got[0] == max(got.values())
    assert all(got[0] > got[i] for i in range(2, 8))


def test_pagerank_duplicate_edges_ignored(spark):
    df1 = spark.createDataFrame(EDGES, "src long, dst long")
    df2 = spark.createDataFrame(EDGES + EDGES[:3], "src long, dst long")
    a = sorted(tuple(r) for r in pagerank(df1, iters=2).collect())
    b = sorted(tuple(r) for r in pagerank(df2, iters=2).collect())
    assert a == b


def test_pagerank_duckdb_replay(spark):
    df = spark.createDataFrame(EDGES + [(9, 1)], "src long, dst long")
    srows = sorted(tuple(r) for r in pagerank(df, iters=3).collect())
    vals = ", ".join(f"({u}, {v})" for u, v in EDGES + [(9, 1)])
    sql = oracles.pagerank_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", iters=3
    )
    con = duckdb.connect()
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows and len(srows) == 5


def test_pagerank_iters_validation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)


def test_pagerank_plain_sum_matches_fold_after_rounding(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = sorted(tuple(r) for r in pagerank(df, iters=3).collect())
    b = sorted(
        tuple(r) for r in pagerank(df, iters=3, exact_fold=False).collect()
    )
    assert a == b


def test_pagerank_auto_fold_switch(spark, monkeypatch):
    """Default exact_fold=None folds below PR_FOLD_EDGE_LIMIT (bit-equal
    to exact_fold=True) and plain-sums past it (equal after round-6);
    personalized_pagerank mirrors the same switch."""
    import vectordbindexing_spark.operators.pagerank as pr

    df = spark.createDataFrame(EDGES + [(9, 1)], "src long, dst long")
    auto = sorted(tuple(r) for r in pr.pagerank(df, iters=3).collect())
    fold = sorted(
        tuple(r) for r in pr.pagerank(df, iters=3, exact_fold=True).collect()
    )
    assert auto == fold  # small graph -> auto picked the fold

    # force the limit below the edge count: auto must take the sum path
    monkeypatch.setattr(pr, "PR_FOLD_EDGE_LIMIT", 1)
    low = sorted(tuple(r) for r in pr.pagerank(df, iters=3).collect())
    summed = sorted(
        tuple(r) for r in pr.pagerank(df, iters=3, exact_fold=False).collect()
    )
    assert low == summed == fold  # round-6 output equal on this graph

    seeds = spark.createDataFrame([(1,)], "id long")
    p_auto = sorted(
        tuple(r)
        for r in pr.personalized_pagerank(df, seeds, iters=3).collect()
    )
    monkeypatch.setattr(pr, "PR_FOLD_EDGE_LIMIT", 10_000)
    p_fold = sorted(
        tuple(r)
        for r in pr.personalized_pagerank(
            df, seeds, iters=3, exact_fold=True
        ).collect()
    )
    assert p_auto == p_fold
