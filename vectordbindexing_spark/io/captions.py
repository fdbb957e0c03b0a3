"""Caption/results ingestion-egress (SURVEY §2.1 last rows).

- CSV caption read: reference pattern ``pd.read_csv → groupby(filename)
  .first() → limit`` (flickr30k_clip.ipynb cell 4) as a declarative job.
- Results JSON sink/source: the reference persists per-query top-k dicts
  as JSON ({query_idx: [ids]}, hnsw_baseline_analysis.ipynb cell 6);
  here a line-JSON table (splittable, schema-full) with the same content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_captions_csv(
    spark: SparkSession,
    path: str,
    file_col: str = "image",
    caption_col: str = "caption",
    limit: int | None = None,
    sep: str = ",",
) -> DataFrame:
    """(file, caption) — first caption per file, deterministic by caption
    sort (the Spark form of pandas groupby-first: min over captions),
    optional limit by ascending file name."""
    raw = spark.read.option("header", "true").option("sep", sep).csv(path)
    firsts = raw.groupBy(file_col).agg(F.min(caption_col).alias(caption_col))
    out = firsts.orderBy(file_col)
    return out.limit(limit) if limit is not None else out


def save_results_json(results: DataFrame, path: str) -> None:
    """(qid, nbr_rank, neighbor_id[, dist]) → line-JSON
    {"qid": .., "ids": [..]} ordered by rank."""
    packed = results.groupBy("qid").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("nbr_rank", "neighbor_id"))),
            lambda s: s["neighbor_id"],
        ).alias("ids")
    )
    packed.write.mode("overwrite").json(path)


def load_results_json(spark: SparkSession, path: str) -> DataFrame:
    """line-JSON → (qid, nbr_rank, neighbor_id) exploded back."""
    raw = spark.read.json(path)
    return raw.select(
        F.col("qid").cast("long"),
        F.posexplode("ids").alias("pos", "neighbor_id"),
    ).select(
        "qid", (F.col("pos") + 1).cast("long").alias("nbr_rank"),
        F.col("neighbor_id").cast("long"),
    )
