"""Connected-components / dedup-group tests: star-algorithm fixed point
vs a driver-side union-find oracle, plus the dedup_groups corpus contract."""

import pandas as pd
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.components import (
    connected_components,
    dedup_groups,
)


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    expect = _union_find(edges, nodes)
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"])
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == expect


def test_chain_long_diameter(spark):
    # 30-node path: naive min-propagation needs 30 rounds; the star
    # algorithm must converge inside its default max_rounds=20 (O(log n)).
    _check(spark, [(i, i + 1) for i in range(30)])


def test_nonconvergence_raises_not_partial(spark):
    # a budget too small to reach the fixed point must raise — silently
    # returning partial labels would produce wrong dedup keeper flags
    import pytest

    pairs = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(30)], columns=["id_a", "id_b"])
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        # local_limit=0 forces the distributed star rounds — the
        # bounded-collect route has no round budget to exhaust
        connected_components(pairs, max_rounds=1, local_limit=0)


def test_local_route_matches_star_rounds(spark):
    """The bounded-collect union-find (the small-graph gate) must label
    identically to the distributed star rounds — chains, cliques,
    reversed/duplicate edges and singleton roots all covered."""
    import random

    rng = random.Random(3)
    edges = [(i, i + 1) for i in range(0, 40, 2)]          # 20 chains
    edges += [(100 + a, 100 + b) for a in range(6) for b in range(a)]
    edges += [(rng.randrange(200, 260), rng.randrange(200, 260))
              for _ in range(80)]
    edges += [(b, a) for a, b in edges[:10]]                # reversed dups
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"])
    )
    local = {
        (r["id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    star = {
        (r["id"], r["component"])
        for r in connected_components(pairs, local_limit=0).collect()
    }
    assert local == star


def test_multiple_components_and_shapes(spark):
    edges = (
        [(1, 2), (2, 3), (3, 1)]          # triangle
        + [(10, 11), (11, 12)]            # path
        + [(20, 21)]                      # pair
        + [(30, 31), (30, 32), (30, 33)]  # star
        + [(40, 41), (42, 41), (43, 40), (43, 42)]  # diamond-ish
    )
    _check(spark, edges)


def test_duplicate_and_reversed_edges(spark):
    _check(spark, [(5, 9), (9, 5), (5, 9), (7, 5), (9, 7)])


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], schema="id_a long, id_b long")
    assert connected_components(pairs).count() == 0


def test_dedup_groups_singletons_and_keepers(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(8)], schema="doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2)], schema="id_a long, id_b long"
    )
    out = dedup_groups(docs, pairs).toPandas().set_index("doc_id")
    assert out.loc[0, "group_id"] == 0 and out.loc[3, "group_id"] == 0
    assert out.loc[5, "group_id"] == 0 and out.loc[0, "group_size"] == 3
    assert out.loc[1, "group_id"] == 1 and out.loc[2, "group_size"] == 2
    for s in (4, 6, 7):  # singletons keep themselves
        assert out.loc[s, "group_id"] == s
        assert out.loc[s, "group_size"] == 1
        assert bool(out.loc[s, "is_keeper"])
    assert sorted(out[out["is_keeper"]].index) == [0, 1, 4, 6, 7]
    # keeper count == group count
    assert out["is_keeper"].sum() == out["group_id"].nunique()


def test_keeps_total_row_count(spark):
    docs = spark.range(50).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(i, i + 10) for i in range(0, 30, 3)], schema="id_a long, id_b long"
    )
    out = dedup_groups(docs, pairs)
    assert out.count() == 50
    assert out.select("doc_id").distinct().count() == 50
    # group minimum is always the keeper
    assert (
        out.groupBy("group_id")
        .agg(F.min("doc_id").alias("mn"))
        .join(out.filter("is_keeper"), "group_id")
        .filter(F.col("mn") != F.col("doc_id"))
        .count()
        == 0
    )
