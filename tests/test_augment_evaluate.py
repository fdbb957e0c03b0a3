"""Edge augmentation semantics + traced search / sweep harness."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def setup(spark, tables):
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import build_two_layer_index

    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") % 10 == 5).limit(20)
    b = emb.filter(F.col("vec_id") % 10 != 5)
    topk = exact_knn(q, b, k=8, metric="cosine", impl="blocked",
                     q_id="vec_id", q_vec="embedding",
                     b_id="vec_id", b_vec="embedding")
    edges = build_two_layer_index(b, M0=12, M1=6, metric="cosine",
                                  id_col="vec_id", vec_col="embedding")
    return q, b, topk, edges


def test_augment_star(spark, setup):
    from vectordbindexing_spark.operators.augment import augment_from_query_topk

    q, b, topk, _ = setup
    new = augment_from_query_topk(topk, b, strategy="star",
                                  max_new_edges_per_node=100,
                                  b_id="vec_id", b_vec="embedding")
    rows = new.collect()
    assert rows and all(r["edge_type"] == "cross_distribution" for r in rows)
    # star: every edge touches the per-query top-1 pivot
    pivots = {r["neighbor_id"] for r in topk.filter("nbr_rank = 1").collect()}
    assert all(r["src"] in pivots or r["dst"] in pivots for r in rows)


def test_augment_clique_and_budget(spark, setup):
    from vectordbindexing_spark.operators.augment import augment_from_query_topk

    q, b, topk, _ = setup
    new = augment_from_query_topk(topk, b, strategy="clique",
                                  max_new_edges_per_node=4,
                                  b_id="vec_id", b_vec="embedding")
    deg = new.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert deg <= 4  # per-node budget honored


def test_augment_projection_subset_of_star(spark, setup):
    from vectordbindexing_spark.operators.augment import augment_from_query_topk

    q, b, topk, _ = setup
    star = {(r["src"], r["dst"]) for r in augment_from_query_topk(
        topk, b, strategy="star", max_new_edges_per_node=100,
        b_id="vec_id", b_vec="embedding").collect()}
    proj = {(r["src"], r["dst"]) for r in augment_from_query_topk(
        topk, b, strategy="projection", max_new_edges_per_node=100,
        b_id="vec_id", b_vec="embedding").collect()}
    assert proj and proj <= star  # occlusion prunes the star set


def test_merge_and_counters(spark, setup):
    from vectordbindexing_spark.operators.augment import (
        augment_from_query_topk,
        cross_edge_counters,
        merge_augmented,
    )

    q, b, topk, edges = setup
    new = augment_from_query_topk(topk, b, strategy="projection",
                                  b_id="vec_id", b_vec="embedding")
    merged = merge_augmented(edges, new)
    # no duplicate (layer, src, dst)
    assert merged.groupBy("layer", "src", "dst").count().filter(
        "count > 1").count() == 0
    counters = {(r["layer"], r["edge_type"]): r["n_edges"]
                for r in cross_edge_counters(merged).collect()}
    assert any(t == "base" for _, t in counters)
    assert any(t == "cross_distribution" for _, t in counters)


def test_layer1_clique_on_upper_nodes(spark, tables):
    from vectordbindexing_spark.operators.augment import augment_layer1_clique
    from vectordbindexing_spark.operators.graph import assign_levels

    emb = tables["embeddings"]
    leveled = assign_levels(emb.withColumnRenamed("vec_id", "id"), M=4).select(
        "id", F.col("embedding"), "level"
    )
    q = emb.filter(F.col("vec_id") % 10 == 5).limit(10)
    new = augment_layer1_clique(q, leveled, top_k=5,
                                max_new_edges_per_node=6, metric="cosine",
                                q_id="vec_id", q_vec="embedding",
                                b_id="id", b_vec="embedding")
    rows = new.collect()
    assert rows and all(r["layer"] == 1 for r in rows)
    upper = {r["id"] for r in leveled.filter("level >= 1").collect()}
    assert all(r["src"] in upper and r["dst"] in upper for r in rows)


def test_traced_search_and_summary(spark, tables, setup):
    from vectordbindexing_spark.operators.evaluate import steps_summary, traced_search
    from vectordbindexing_spark.operators.search import compact_index

    q, b, topk, edges = setup
    idx = compact_index(edges, b, id_col="vec_id", vec_col="embedding",
                        metric="cosine")
    targets = topk.filter("nbr_rank = 1").select(
        "qid", F.col("neighbor_id").alias("target_id")
    )
    tr = traced_search(q, idx, targets, q_id="vec_id", q_vec="embedding")
    rows = tr.collect()
    assert len(rows) == targets.count()
    summary = steps_summary(tr).collect()[0]
    assert summary["found_rate"] >= 0.8  # nearest neighbor reachable
    assert summary["mean_steps"] > 0


def test_sweep_recall_monotone_in_ef(spark, setup):
    from vectordbindexing_spark.operators.evaluate import sweep_ef
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.search import compact_index

    q, b, topk, edges = setup
    idx = compact_index(edges, b, id_col="vec_id", vec_col="embedding",
                        metric="cosine")
    exact = exact_knn(q, b, k=5, metric="cosine", impl="blocked",
                      q_id="vec_id", q_vec="embedding",
                      b_id="vec_id", b_vec="embedding")
    table = sweep_ef(q, idx, exact, k=5, ef_grid=(4, 64), entry_grid=(3,),
                     q_id="vec_id", q_vec="embedding")
    r_small = table[table.ef_search == 4].recall_at_k.iloc[0]
    r_big = table[table.ef_search == 64].recall_at_k.iloc[0]
    assert r_big >= r_small  # recall monotone in ef (property check)
    assert r_big >= 0.9


def test_projection_chain_extra_edges(spark, tables, setup):
    """chain_extra adds up to that many consecutive picked-pair links per
    query on top of the projection star (hnsw_cosine.py:671-681)."""
    q, b, topk, _ = setup
    from vectordbindexing_spark.operators.augment import augment_from_query_topk

    base_edges = augment_from_query_topk(
        topk, b, strategy="projection", max_new_edges_per_node=100,
        b_id="vec_id", b_vec="embedding",
    )
    chained = augment_from_query_topk(
        topk, b, strategy="projection", max_new_edges_per_node=100,
        b_id="vec_id", b_vec="embedding", chain_extra=2,
    )
    n0, n1 = base_edges.count(), chained.count()
    assert n1 > n0  # chains added
    n_q = topk.select("qid").distinct().count()
    # each query adds at most chain_extra bidirectional pairs
    assert n1 - n0 <= 2 * 2 * n_q
    # chain_extra=0 is the default behaviour
    assert base_edges.count() == augment_from_query_topk(
        topk, b, strategy="projection", max_new_edges_per_node=100,
        b_id="vec_id", b_vec="embedding", chain_extra=0,
    ).count()
