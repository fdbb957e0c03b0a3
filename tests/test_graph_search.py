"""Graph build + ANN search: invariants and recall floors vs exact oracle."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(tables):
    return tables["embeddings"]


def test_assign_levels_distribution(spark, emb):
    from vectordbindexing_spark.operators.graph import assign_levels

    lv = assign_levels(emb, id_col="vec_id", M=16)
    counts = {r["level"]: r["cnt"] for r in
              lv.groupBy("level").agg(F.count("*").alias("cnt")).collect()}
    n = sum(counts.values())
    assert counts[0] > 0.85 * n  # P(level>=1) = 1/16
    assert max(counts) <= 7
    # deterministic: same result twice
    lv2 = {r["vec_id"]: r["level"] for r in
           assign_levels(emb, id_col="vec_id", M=16).collect()}
    lv1 = {r["vec_id"]: r["level"] for r in lv.collect()}
    assert lv1 == lv2


def test_knn_graph_invariants(spark, emb):
    from vectordbindexing_spark.operators.graph import degree_stats, knn_graph, mutualize

    g = knn_graph(emb.limit(200), k=5, metric="cosine",
                  id_col="vec_id", vec_col="embedding")
    rows = g.collect()
    assert all(r["src"] != r["dst"] for r in rows)  # no self-loops
    deg = degree_stats(g).collect()[0]
    assert deg["max_degree"] == 5 and deg["min_degree"] == 5
    m = mutualize(g, max_degree=8)
    mdeg = degree_stats(m).collect()[0]
    assert mdeg["max_degree"] <= 8
    # mutualize keeps edge set symmetric-before-cap: spot check no dup pairs
    assert m.groupBy("layer", "src", "dst").count().filter("count > 1").count() == 0


def test_two_layer_search_recall(spark, emb):
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import build_two_layer_index
    from vectordbindexing_spark.operators.search import compact_index, graph_search

    q = emb.filter(F.col("vec_id") % 10 == 0)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    edges = build_two_layer_index(b, M0=16, M1=8, metric="cosine",
                                  id_col="vec_id", vec_col="embedding")
    idx = compact_index(edges, b, id_col="vec_id", vec_col="embedding",
                        metric="cosine")
    got = graph_search(q, idx, k=10, ef_search=64,
                       q_id="vec_id", q_vec="embedding")
    ex = exact_knn(q, b, k=10, metric="cosine", impl="blocked",
                   q_id="vec_id", q_vec="embedding",
                   b_id="vec_id", b_vec="embedding")
    gp = got.groupBy("qid").agg(F.collect_set("neighbor_id").alias("p"))
    ep = ex.groupBy("qid").agg(F.collect_set("neighbor_id").alias("g"))
    rec = (
        gp.join(ep, "qid")
        .select((F.size(F.array_intersect("p", "g")) / 10.0).alias("r"))
        .agg(F.avg("r"))
        .collect()[0][0]
    )
    assert rec >= 0.9, f"graph search recall@10 too low: {rec}"


def test_roargraph_build_and_search_recall(spark, emb):
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import degree_stats, roargraph_build
    from vectordbindexing_spark.operators.search import compact_index, graph_search

    train_q = emb.filter(F.col("vec_id") % 10 == 5)  # train queries
    test_q = emb.filter(F.col("vec_id") % 10 == 0)
    b = emb.filter((F.col("vec_id") % 10 != 0) & (F.col("vec_id") % 10 != 5))
    edges = roargraph_build(
        train_q, b, k_nn=50, n_targets=10, M_pjbp=16, metric="cosine",
        q_id="vec_id", q_vec="embedding", b_id="vec_id", b_vec="embedding",
    )
    st = degree_stats(edges).collect()[0]
    assert st["avg_degree"] > 2  # reference sanity floor (README.md:101-121)
    assert st["max_degree"] <= 32
    idx = compact_index(edges, b, id_col="vec_id", vec_col="embedding",
                        metric="cosine")
    got = graph_search(test_q, idx, k=10, ef_search=64,
                       q_id="vec_id", q_vec="embedding")
    ex = exact_knn(test_q, b, k=10, metric="cosine", impl="blocked",
                   q_id="vec_id", q_vec="embedding",
                   b_id="vec_id", b_vec="embedding")
    gp = got.groupBy("qid").agg(F.collect_set("neighbor_id").alias("p"))
    epx = ex.groupBy("qid").agg(F.collect_set("neighbor_id").alias("g"))
    rec = (
        gp.join(epx, "qid")
        .select((F.size(F.array_intersect("p", "g")) / 10.0).alias("r"))
        .agg(F.avg("r"))
        .collect()[0][0]
    )
    # reference band for python RoarGraph: 0.60-0.85 (hnsw_optimization/README.md:97)
    assert rec >= 0.6, f"roargraph recall@10 too low: {rec}"


def test_graph_search_with_stats(spark, emb):
    from vectordbindexing_spark.operators.graph import build_two_layer_index
    from vectordbindexing_spark.operators.search import compact_index, graph_search
    from vectordbindexing_spark.operators.metrics import percentiles

    q = emb.filter(F.col("vec_id") % 10 == 0).limit(10)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    edges = build_two_layer_index(b, M0=12, M1=6, metric="cosine",
                                  id_col="vec_id", vec_col="embedding")
    idx = compact_index(edges, b, id_col="vec_id", vec_col="embedding")
    got = graph_search(q, idx, k=5, ef_search=32, with_stats=True,
                       q_id="vec_id", q_vec="embedding")
    rows = got.collect()
    assert {"visited_count", "hops", "latency_us"} <= set(got.columns)
    assert all(r["visited_count"] > 0 and r["hops"] > 0 for r in rows)
    assert all(r["latency_us"] >= 0 for r in rows)
    # stats aggregate (reference batch_search mean/std of visited+latency)
    summary = percentiles(
        got.filter("nbr_rank = 1"), "visited_count"
    ).collect()[0]
    assert summary["mean"] > 0


def test_occlusion_alpha_orientation(spark):
    """Pin the reference prune orientation (roargraph_python.py:177-231):
    r occludes c when d(c,r) <= alpha*d(c,t) — larger alpha prunes MORE.

    Collinear L2 layout: t=(0,0), r=(1,0), c=(2,0); query at (0.1,0) so the
    top-3 ranks are [t, r, c] and the single pivot is t. With picked={r},
    c survives iff d(c,r)=1 > alpha*d(c,t)=2*alpha, i.e. iff alpha < 0.5.
    """
    from vectordbindexing_spark.operators.graph import roargraph_build

    base = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [2.0, 0.0])],
        "id long, vec array<double>",
    )
    q = spark.createDataFrame([(100, [0.1, 0.0])], "qid long, vec array<double>")

    def tc_edges(alpha):
        e = roargraph_build(
            q, base, k_nn=3, n_targets=1, M_pjbp=5,
            occlude_alpha=alpha, metric="l2",
        )
        return {(r["src"], r["dst"]) for r in e.collect()}

    assert (1, 3) in tc_edges(0.4)      # alpha < 0.5 keeps c
    assert (1, 3) not in tc_edges(1.0)  # default alpha prunes c
    assert (1, 3) not in tc_edges(1.5)  # larger alpha prunes at least as much


def test_multi_path_search(spark, emb):
    """max_paths=1 must reduce to the single-path beam exactly; larger
    max_paths emits path counts and keeps the recall contract."""
    from vectordbindexing_spark.operators.graph import build_two_layer_index
    from vectordbindexing_spark.operators.search import compact_index, graph_search

    q = emb.filter(F.col("vec_id") % 10 == 0).limit(20)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    edges = build_two_layer_index(b, M0=12, M1=6, metric="cosine",
                                  id_col="vec_id", vec_col="embedding")
    idx = compact_index(edges, b, id_col="vec_id", vec_col="embedding")

    base = sorted(tuple(r) for r in graph_search(
        q, idx, k=5, ef_search=32, q_id="vec_id", q_vec="embedding").collect())
    one = sorted(tuple(r) for r in graph_search(
        q, idx, k=5, ef_search=32, max_paths=1,
        q_id="vec_id", q_vec="embedding").collect())
    assert one == base  # popping 1 head per round == single-path search

    multi = graph_search(q, idx, k=5, ef_search=32, max_paths=3,
                         with_stats=True, q_id="vec_id", q_vec="embedding")
    rows = multi.collect()
    assert "path_pops" in multi.columns
    assert all(r["path_pops"] > 0 for r in rows)
    # multi-path explores at least as much per round as single-path
    assert all(r["path_pops"] >= r["hops"] for r in rows)


def test_filtered_graph_search_respects_allowed(spark, tables):
    from pyspark.sql import functions as F

    from vectordbindexing_spark.operators.graph import build_two_layer_index
    from vectordbindexing_spark.operators.search import (
        compact_index,
        filtered_graph_search,
    )

    emb = tables["embeddings"]
    b = emb.filter(F.col("vec_id") % 10 != 0)
    q = emb.filter(F.col("vec_id") % 10 == 0).limit(20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    edges = build_two_layer_index(b, M0=8, M1=4, metric="cosine",
                                  id_col="vec_id", vec_col="embedding")
    idx = compact_index(edges, b, id_col="vec_id", vec_col="embedding",
                        metric="cosine")
    allowed = b.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("id")
    )
    out = filtered_graph_search(q, idx, allowed, k=5, overfetch=4)
    rows = out.collect()
    assert rows, "filtered search returned nothing"
    assert all(r["neighbor_id"] % 2 == 0 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r)
    # ~half the corpus is allowed; 4x overfetch should fill k everywhere
    assert all(len(v) == 5 for v in per_q.values())
    for v in per_q.values():
        d = [r["dist"] for r in sorted(v, key=lambda r: r["nbr_rank"])]
        assert d == sorted(d)


def test_graph_paths_exclude_null_vectors(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from vectordbindexing_spark.operators.graph import (
        build_two_layer_index,
        knn_graph,
        mutualize,
    )
    from vectordbindexing_spark.operators.search import (
        compact_index,
        frontier_search,
        graph_search,
    )

    rng = np.random.default_rng(0)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    df = spark.createDataFrame(rows + [(99, None)], "id long, vec array<double>")
    q = spark.createDataFrame(
        [(9, [float(x) for x in rng.normal(size=8)]), (8, None)],
        "qid long, vec array<double>",
    )
    edges = build_two_layer_index(df, M0=4, M1=2, metric="cosine",
                                  id_col="id", vec_col="vec")
    idx = compact_index(edges, df, id_col="id", vec_col="vec", metric="cosine")
    out = graph_search(q, idx, k=3, ef_search=16, q_id="qid", q_vec="vec").collect()
    e2 = mutualize(knn_graph(df, 4, "cosine", "id", "vec"), max_degree=8)
    out2 = frontier_search(
        q, e2, df, k=3, rounds=2, beam=8, metric="cosine",
        q_id="qid", q_vec="vec", b_id="id", b_vec="vec",
    ).collect()
    for rows_ in (out, out2):
        assert rows_ and all(r["qid"] == 9 for r in rows_)
        assert all(r["neighbor_id"] != 99 for r in rows_)


def test_diversify_edges_rng_rule(spark):
    """Select-neighbors heuristic: a candidate closer to an already-kept
    neighbor than to the source is occluded; farther-but-diverse
    candidates survive."""
    import math

    from vectordbindexing_spark.operators.graph import diversify_edges

    pts = {0: (0.0, 0.0), 1: (1.0, 0.0), 2: (1.2, 0.1), 3: (0.0, 1.5)}
    base = spark.createDataFrame(
        [(i, list(v)) for i, v in pts.items()],
        schema="id long, vec array<double>",
    )

    def d(a, b):
        return math.dist(pts[a], pts[b])

    edges = spark.createDataFrame(
        [(0, 0, j, d(0, j)) for j in (1, 2, 3)],
        schema="layer int, src long, dst long, dist double",
    )
    out = diversify_edges(edges, base, max_degree=3, alpha=1.0, metric="l2")
    kept = sorted(r["dst"] for r in out.collect())
    # 2 is occluded by 1 (d(0,2)=1.204 > d(2,1)=0.224); 3 is diverse
    assert kept == [1, 3]


def test_heuristic_build_recall_not_worse(spark, tables):
    """The diversified build must not lose recall vs the plain kNN build
    at the same (M, ef) — at corpus scale it gains dramatically
    (0.61→… at 100k); at test scale non-degradation is the invariant."""
    from pyspark.sql import functions as F

    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import build_two_layer_index
    from vectordbindexing_spark.operators.search import (
        compact_index,
        graph_search,
    )

    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    b = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    exact = exact_knn(q, b, k=10, metric="cosine", impl="blocked"
                      ).select("qid", "neighbor_id").localCheckpoint(True)
    n_ex = exact.count()

    def rec(heuristic):
        edges = build_two_layer_index(b, M0=8, M1=4, metric="cosine",
                                      heuristic=heuristic)
        idx = compact_index(edges, b, metric="cosine")
        got = graph_search(q, idx, k=10, ef_search=16)
        return got.select("qid", "neighbor_id").join(
            exact, ["qid", "neighbor_id"]
        ).count() / n_ex

    r_plain, r_heur = rec(False), rec(True)
    assert r_heur >= r_plain - 1e-9, (r_plain, r_heur)
