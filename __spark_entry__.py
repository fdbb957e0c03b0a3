"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver hash-compares
against at sf=0.01. Every computed column is aliased identically on both
sides, and every float column is rounded (cross-engine drift is ~1 ulp,
measured 2.2e-16; rounding granularity 1e-6 makes hashes stable).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordbindexing_spark.io.tables import load_table


def _emb_split(spark: SparkSession, sf_dir: str):
    """Query/base split of the embeddings table: vec_id % 10 == 0 → query."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 10 == 0)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    return q, b


def _knn_query(metric: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from vectordbindexing_spark.operators.exact_knn import exact_knn

        q, b = _emb_split(spark, sf_dir)
        return (
            exact_knn(
                q, b, k=10, metric=metric, impl="blocked",
                q_id="vec_id", q_vec="embedding", b_id="vec_id", b_vec="embedding",
            )
            .withColumn("dist", F.round("dist", 6))
            .orderBy("qid", "nbr_rank")
        )

    return run


_KNN_DIST_SQL = {
    "cosine": (
        "1.0 - list_inner_product(q.v, b.v) / "
        "(sqrt(list_inner_product(q.v,q.v)) * sqrt(list_inner_product(b.v,b.v)))"
    ),
    "l2": (
        "sqrt(greatest(list_inner_product(q.v,q.v) + list_inner_product(b.v,b.v) "
        "- 2*list_inner_product(q.v,b.v), 0.0))"
    ),
    "ip": "-list_inner_product(q.v, b.v)",
}


def _knn_oracle(metric: str, k: int = 10) -> str:
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS qid, v FROM e WHERE vec_id % 10 = 0),
         b AS (SELECT vec_id AS id, v FROM e WHERE vec_id % 10 <> 0),
         d AS (SELECT q.qid, b.id, {_KNN_DIST_SQL[metric]} AS dist FROM q, b),
         r AS (SELECT qid, id, dist,
                      row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rnk
               FROM d)
    SELECT qid, rnk AS nbr_rank, id AS neighbor_id, round(dist, 6) AS dist
    FROM r WHERE rnk <= {k}
    """


def _tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectordbindexing_spark.operators.dedup import exact_dedup_stats

    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_stats(docs, text_col="text", id_col="doc_id")


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS fingerprint,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


def _text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectordbindexing_spark.operators.textops import token_stats

    docs = load_table(spark, sf_dir, "documents")
    return token_stats(docs, text_col="text", id_col="doc_id")


_TEXT_TOKEN_STATS_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id,
       n_chars,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct_tokens,
       round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks), 4)
           AS avg_token_len
FROM t
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact cosine top-10 ANN join on sf0.001 embeddings."""
    return _knn_query("cosine")(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "knn_exact_cosine": _knn_query("cosine"),
        "knn_exact_l2": _knn_query("l2"),
        "knn_exact_ip": _knn_query("ip"),
        "tpch_q1_pricing_summary": _tpch_q1,
        "dedup_exact": _dedup_exact,
        "text_token_stats": _text_token_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "knn_exact_cosine": _knn_oracle("cosine"),
        "knn_exact_l2": _knn_oracle("l2"),
        "knn_exact_ip": _knn_oracle("ip"),
        "tpch_q1_pricing_summary": _TPCH_Q1_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "text_token_stats": _TEXT_TOKEN_STATS_SQL,
    }
