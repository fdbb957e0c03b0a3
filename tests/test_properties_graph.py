"""Hypothesis property tests for the graph-analytics operators:
random small graphs vs the independent python references."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vectordbindexing_spark.operators.labelprop import label_propagation
from vectordbindexing_spark.operators.triangles import kcore, triangle_counts
from vectordbindexing_spark.operators.walks import random_walks

from test_labelprop import _py_lp
from test_triangles import _py_kcore, _py_triangles
from test_walks import _py_walks

edges_st = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(edges=edges_st)
def test_triangles_random_graphs(spark, edges):
    nontrivial = [e for e in edges if e[0] != e[1]]
    if not nontrivial:
        return
    df = spark.createDataFrame(nontrivial, "src long, dst long")
    got = {r["id"]: (r["degree"], r["triangles"]) for r in
           triangle_counts(df).collect()}
    want = {v: (d, t) for v, (d, t, _) in _py_triangles(nontrivial).items()}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(edges=edges_st, k=st.integers(1, 4))
def test_kcore_random_graphs(spark, edges, k):
    nontrivial = [e for e in edges if e[0] != e[1]]
    if not nontrivial:
        return
    df = spark.createDataFrame(nontrivial, "src long, dst long")
    got = {r["id"]: r["core_degree"] for r in kcore(df, k=k).collect()}
    assert got == _py_kcore(nontrivial, k)


@settings(max_examples=8, deadline=None)
@given(
    edges=edges_st,
    seeds=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 3)),
        min_size=1, max_size=5, unique_by=lambda t: t[0],
    ),
    iters=st.integers(1, 3),
)
def test_labelprop_random_graphs(spark, edges, seeds, iters):
    nontrivial = [e for e in edges if e[0] != e[1]]
    if not nontrivial:
        return
    e = spark.createDataFrame(nontrivial, "src long, dst long")
    s = spark.createDataFrame(seeds, "id long, label long")
    got = {r["id"]: r["label"]
           for r in label_propagation(e, s, iters=iters).collect()}
    assert got == _py_lp(nontrivial, seeds, iters)


@settings(max_examples=8, deadline=None)
@given(edges=edges_st, walk_len=st.integers(1, 5))
def test_walks_random_graphs(spark, edges, walk_len):
    nontrivial = [e for e in edges if e[0] != e[1]]
    if not nontrivial:
        return
    df = spark.createDataFrame(nontrivial, "src long, dst long")
    got = {(r["walk_id"], r["step"]): r["node"]
           for r in random_walks(df, walk_len=walk_len).collect()}
    assert got == _py_walks(nontrivial, walk_len, 1)
