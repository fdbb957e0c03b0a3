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


def test_bucketed_build_recall_and_bounds(spark):
    """r07 scale build: the salt-bounded in-kernel bucketed kNN graph.
    On a corpus whose buckets fit one group it matches the exact blocked
    edges almost everywhere; under a tiny forced group_cap it still
    emits exactly k edges per node (bounded work, never a candidate-join
    explosion) and the two-layer graph it feeds still serves."""
    from pyspark.sql import functions as F

    from vectordbindexing_spark.io.synthetic import (
        synthetic_queries,
        synthetic_vectors,
    )
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import (
        _knn_graph_bucketed,
        build_two_layer_index,
        knn_graph,
    )
    from vectordbindexing_spark.operators.search import (
        compact_index,
        graph_search,
    )

    b = synthetic_vectors(spark, 3000, 32).select("id", "vec")
    b = b.localCheckpoint(eager=True)
    exact = knn_graph(b, 8, impl="blocked")
    bucketed = knn_graph(b, 8, impl="bucketed")
    hit = exact.select("src", "dst").intersect(
        bucketed.select("src", "dst")
    ).count()
    assert hit / exact.count() >= 0.95
    # structural bound: k edges per node regardless of group_cap
    tiny = _knn_graph_bucketed(
        b, 8, "cosine", "id", "vec", layer=0, group_cap=256
    )
    per = tiny.groupBy("src").agg(F.count(F.lit(1)).alias("m"))
    assert per.agg(F.max("m")).first()[0] == 8
    assert per.count() == 3000

    # end-to-end: bucketed two-layer build still navigates
    edges = build_two_layer_index(b, M0=16, M1=8, impl="bucketed")
    idx = compact_index(edges, b)
    q = synthetic_queries(spark, 200, 32).select("qid", "vec")
    got = graph_search(q, idx, k=10, ef_search=128)
    ex = exact_knn(q, b, 10, "cosine")
    gp = got.groupBy("qid").agg(F.collect_set("neighbor_id").alias("p"))
    ep = ex.groupBy("qid").agg(F.collect_set("neighbor_id").alias("g"))
    rec = (
        gp.join(ep, "qid")
        .select((F.size(F.array_intersect("p", "g")) / 10.0).alias("r"))
        .agg(F.avg("r"))
        .first()[0]
    )
    assert rec >= 0.9, rec


def test_refine_knn_graph_improves_edges(spark):
    """NN-descent rounds must (a) keep exactly k edges per node, (b)
    never lose edge recall, and (c) strictly improve it from a
    deliberately poor starting graph on a spread corpus."""
    from pyspark.sql import functions as F

    from vectordbindexing_spark.io.synthetic import synthetic_vectors
    from vectordbindexing_spark.operators.graph import (
        knn_graph,
        refine_knn_graph,
    )

    b = synthetic_vectors(spark, 2000, 16, n_modalities=16).select(
        "id", "vec"
    ).localCheckpoint(eager=True)
    exact = knn_graph(b, 6, impl="blocked").localCheckpoint(eager=True)
    ex_n = exact.count()

    # genuinely poor start: a deterministic RANDOM 6-regular graph
    # (dist placeholder 0 — refine rescores every proposal exactly)
    start = (
        b.select(F.col("id").alias("src"))
        .select(
            "src",
            F.explode(F.sequence(F.lit(1), F.lit(6))).alias("_j"),
        )
        .select(
            F.lit(0).alias("layer"),
            "src",
            F.pmod(F.col("src") * 7919 + F.col("_j") * 104729, F.lit(2000))
            .alias("dst"),
            F.lit(0.0).alias("dist"),
        )
        .filter(F.col("src") != F.col("dst"))
    )

    def rec(g):
        return exact.select("src", "dst").intersect(
            g.select("src", "dst")
        ).count() / ex_n

    r0 = rec(start)
    refined = refine_knn_graph(start, b, 6, rounds=3)
    r2 = rec(refined)
    assert r0 < 0.2, r0
    assert r2 > r0 + 0.1, (r0, r2)
    per = refined.groupBy("src").agg(F.count(F.lit(1)).alias("m"))
    assert per.agg(F.max("m")).first()[0] == 6
    # every kept dist is the true distance up to the float32 broadcast
    # matrix (same storage convention as CompactIndex serving)
    j = refined.alias("a").join(
        exact.alias("b"),
        (F.col("a.src") == F.col("b.src")) & (F.col("a.dst") == F.col("b.dst")),
    ).select(
        (F.abs(F.col("a.dist") - F.col("b.dist")) < 1e-5).alias("ok")
    )
    assert j.filter(~F.col("ok")).count() == 0


def test_clustered_corpus_stays_connected_and_serves(spark):
    """r07 navigability cliff regression: on a many-cluster corpus a
    pure kNN two-layer graph decomposes into one component per cluster
    (serving recall = entry-covered clusters / clusters). The scale
    builds must union random-matching long links on the top layer: the
    candidate graph becomes ONE component and serving recall recovers."""
    from pyspark.sql import functions as F

    from vectordbindexing_spark.io.synthetic import (
        synthetic_queries,
        synthetic_vectors,
    )
    from vectordbindexing_spark.operators.components import (
        connected_components,
    )
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import (
        build_two_layer_index,
        random_matching_edges,
    )
    from vectordbindexing_spark.operators.search import (
        compact_index,
        graph_search,
    )

    b = synthetic_vectors(spark, 4000, 32, n_modalities=16).select(
        "id", "vec"
    ).localCheckpoint(eager=True)

    # the long-link union makes the top layer one component
    edges = build_two_layer_index(b, impl="bucketed").localCheckpoint(
        eager=True
    )
    l1 = edges.filter(F.col("layer") == 1).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    comp = connected_components(l1)
    n_comp = comp.select("component").distinct().count()
    assert n_comp == 1, f"top layer split into {n_comp} components"

    # and the index actually serves across clusters
    idx = compact_index(edges, b)
    q = synthetic_queries(spark, 200, 32, n_modalities=16).select(
        "qid", "vec"
    )
    got = graph_search(q, idx, k=10, ef_search=128)
    gt = exact_knn(q, b, 10, "cosine").groupBy("qid").agg(
        F.collect_set("neighbor_id").alias("g")
    )
    gp = got.groupBy("qid").agg(F.collect_set("neighbor_id").alias("p"))
    rec = (
        gp.join(gt, "qid")
        .select((F.size(F.array_intersect("p", "g")) / 10.0).alias("r"))
        .agg(F.avg("r"))
        .first()[0]
    )
    assert rec >= 0.9, rec

    # matching-edge invariants: deterministic, exact dists, no loops
    m1 = random_matching_edges(b, rounds=3)
    m2 = random_matching_edges(b, rounds=3)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))
    assert m1.filter(F.col("src") == F.col("dst")).count() == 0


def test_refine_knn_graph_sparse_64bit_ids(spark):
    """Sparse/hashed huge ids must not allocate a dense max(id)+1
    lookup table (2^40 ids would OOM instantly): the broadcast path
    maps ids via searchsorted. Same tiny graph, ids shifted by 2^40."""
    from pyspark.sql import functions as F

    from vectordbindexing_spark.io.synthetic import synthetic_vectors
    from vectordbindexing_spark.operators.graph import (
        knn_graph,
        refine_knn_graph,
    )

    OFF = 1 << 40
    b = synthetic_vectors(spark, 300, 8, n_modalities=4).select(
        (F.col("id") + OFF).alias("id"), "vec"
    ).localCheckpoint(eager=True)
    exact = knn_graph(b, 4, impl="blocked")
    start = (
        b.select(F.col("id").alias("src"))
        .select("src", F.explode(F.sequence(F.lit(1), F.lit(4))).alias("_j"))
        .select(
            F.lit(0).alias("layer"),
            "src",
            (F.pmod((F.col("src") - OFF) * 7919 + F.col("_j") * 104729,
                    F.lit(300)) + OFF).alias("dst"),
            F.lit(0.0).alias("dist"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    refined = refine_knn_graph(start, b, 4, rounds=2)
    assert refined.count() > 0
    assert refined.agg(F.min("src")).first()[0] >= OFF
    ex = exact.select("src", "dst")

    def rec(g):
        return ex.intersect(g.select("src", "dst")).count() / ex.count()

    r0, r2 = rec(start), rec(refined)
    assert r2 > r0, (r0, r2)  # refinement worked on the shifted ids


def test_build_fold_matches_per_layer_collects(spark):
    """r13 fold: build_two_layer_index's ONE bounded collect feeding
    both layers' blocked kernels must yield the bit-identical edge set
    the per-layer knn_graph collects produced — including the
    driver-side layer-1 subset (assign_level_py ≡ the assign_levels
    column) and exact_knn's query-side NULL filter."""
    import numpy as np

    from vectordbindexing_spark.operators.graph import (
        assign_level_py,
        assign_levels,
        build_two_layer_index,
        knn_graph,
        mutualize,
    )

    rng = np.random.default_rng(7)
    n, d, M0, M1, M_level = 150, 8, 6, 3, 16
    rows = [(int(i), [float(x) for x in rng.normal(size=d)])
            for i in range(n)]
    base = spark.createDataFrame(
        rows + [(10_000, None)], "id long, vec array<double>"
    )

    lv = {
        r["id"]: r["level"]
        for r in assign_levels(base, id_col="id", M=M_level).collect()
    }
    assert all(assign_level_py(i, M_level) == lv[i] for i in lv)

    leveled = assign_levels(base, id_col="id", M=M_level)
    upper = leveled.filter(F.col("level") >= 1)
    old = sorted(
        (r["layer"], r["src"], r["dst"], r["dist"])
        for r in mutualize(
            knn_graph(upper, M1, "cosine", "id", "vec",
                      impl="blocked", layer=1).unionByName(
                knn_graph(base, M0, "cosine", "id", "vec",
                          impl="blocked", layer=0)
            ),
            max_degree=2 * max(M0, M1),
        ).collect()
    )
    new = sorted(
        (r["layer"], r["src"], r["dst"], r["dist"])
        for r in build_two_layer_index(
            base, M0=M0, M1=M1, metric="cosine", M_level=M_level
        ).select("layer", "src", "dst", "dist").collect()
    )
    assert old == new
