"""LSH-path graph build: edge quality + end-to-end serving recall."""

from pyspark.sql import functions as F


def test_lsh_knn_graph_edge_overlap(spark, tables):
    from vectordbindexing_spark.operators.graph import knn_graph

    emb = tables["embeddings"]
    exact = knn_graph(emb, k=8, metric="cosine", id_col="vec_id",
                      vec_col="embedding", impl="blocked")
    lsh = knn_graph(emb, k=8, metric="cosine", id_col="vec_id",
                    vec_col="embedding", impl="lsh",
                    num_bits=6, num_tables=8)
    e = {(r["src"], r["dst"]) for r in exact.collect()}
    l = {(r["src"], r["dst"]) for r in lsh.collect()}
    overlap = len(e & l) / len(e)
    assert overlap >= 0.5, f"lsh build edge overlap too low: {overlap}"
    # every node still has edges
    assert lsh.select("src").distinct().count() == emb.count()


def test_two_layer_lsh_build_serves(spark, tables):
    from vectordbindexing_spark.operators.evaluate import recall_vs_exact
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import build_two_layer_index
    from vectordbindexing_spark.operators.search import compact_index, graph_search

    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") % 10 == 0)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    edges = build_two_layer_index(
        b, M0=16, M1=8, metric="cosine", id_col="vec_id",
        vec_col="embedding", impl="lsh",  # force the corpus-scale path
    )
    idx = compact_index(edges, b, id_col="vec_id", vec_col="embedding")
    got = graph_search(q, idx, k=10, ef_search=96,
                       q_id="vec_id", q_vec="embedding")
    ex = exact_knn(q, b, k=10, impl="blocked", q_id="vec_id",
                   q_vec="embedding", b_id="vec_id", b_vec="embedding")
    rec = recall_vs_exact(got, ex, 10)
    # approximate build → looser floor than the exact build's 0.9
    assert rec >= 0.7, f"lsh-built index serving recall too low: {rec}"
