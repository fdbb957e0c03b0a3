"""k-hop reachability BFS + redundant-pair gate (reference can_add check,
hnsw_cosine.py:733-783, re-expressed as frontier joins)."""

from pyspark.sql import functions as F

from vectordbindexing_spark.operators.graph import (
    drop_redundant_pairs,
    khop_reachability,
)


def _edges(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(
        [(0, a, b, 0.5) for a, b in sym],
        schema="layer int, src long, dst long, dist double",
    )


def test_chain_hops_and_bound(spark):
    # path 0-1-2-3-4-5: from 0 with max_hops=3, nodes 0..3 reachable
    e = _edges(spark, [(i, i + 1) for i in range(5)])
    src = spark.createDataFrame([(0,)], "id long")
    got = {
        (r["root"], r["node"]): r["hops"]
        for r in khop_reachability(e, src, max_hops=3).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3}


def test_min_hops_on_shortcut(spark):
    # 0-1-2-3 plus shortcut 0-3: hop(3) must be 1, not 3
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    src = spark.createDataFrame([(0,)], "id long")
    got = {r["node"]: r["hops"] for r in khop_reachability(e, src, 3).collect()}
    assert got[3] == 1 and got[2] == 2


def test_multi_source_and_early_exit(spark):
    # two disconnected pairs; frontier drains after hop 1 (early break)
    e = _edges(spark, [(0, 1), (10, 11)])
    src = spark.createDataFrame([(0,), (10,)], "id long")
    out = khop_reachability(e, src, max_hops=5)
    rows = {(r["root"], r["node"]): r["hops"] for r in out.collect()}
    assert rows == {(0, 0): 0, (0, 1): 1, (10, 10): 0, (10, 11): 1}


def test_drop_redundant_pairs_gate(spark):
    # 0-1-2 connected; 5 isolated. (0,2) reachable in 2 hops → dropped;
    # (0,5) unreachable → kept.
    e = _edges(spark, [(0, 1), (1, 2)])
    cand = spark.createDataFrame([(0, 2), (0, 5)], "src long, dst long")
    kept = drop_redundant_pairs(e, cand, max_hops=3)
    assert [(r["src"], r["dst"]) for r in kept.collect()] == [(0, 5)]
    # with max_hops=1 the 2-hop path no longer disqualifies (0,2)
    kept1 = drop_redundant_pairs(e, cand, max_hops=1)
    assert sorted((r["src"], r["dst"]) for r in kept1.collect()) == [
        (0, 2), (0, 5),
    ]


def test_reachability_rows_bounded_by_roots_times_nodes(spark):
    e = _edges(spark, [(i, j) for i in range(6) for j in range(i + 1, 6)])
    src = spark.createDataFrame([(0,), (3,)], "id long")
    out = khop_reachability(e, src, max_hops=2)
    assert out.count() == 12  # complete graph: 2 roots × 6 nodes
    assert out.filter(F.col("hops") > 1).count() == 0  # diameter 1
