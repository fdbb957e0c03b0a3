"""Bucketed-table persistence for co-located joins.

At corpus scale the repeated joins on the same key (vector id joins in
LSH/IVF candidate scoring, edge-table joins in frontier search, GT joins
in evaluation) shouldn't re-shuffle every query. Writing both sides
bucketed by the join key lets Spark's sort-merge join skip the Exchange
entirely (bucket pruning + co-located scan).

Bucketed tables must live in the session catalog (``saveAsTable``) — plain
parquet paths don't retain bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def load_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> bool:
    """True iff sort-merge-joining the two bucketed tables on ``key`` plans
    no Exchange (the assertion used in tests and capacity reviews). The
    merge hint models the at-scale case — on small tables Catalyst would
    broadcast instead and ignore bucketing entirely."""
    j = (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), key)
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
