"""Streaming lexical-index statistics maintenance — a live (term, df,
tf) + corpus-totals artifact that BM25 serves from, with EXACTLY-ONCE
batch accounting.

This is the incremental-indexing half of the retrieval stack: the
batch side (`operators.retrieval.lexical_stats`) summarizes a document
set; this maintainer folds each micro-batch's summary into a persisted
artifact so `bm25_topk(..., stats=artifact)` can score queries against
corpus statistics that are always current — no full-corpus recompute
per query wave. Exactly the pattern a production engine calls "refresh
the index stats", expressed as Structured Streaming maintenance.

Correctness mechanics (the CMS maintainer's contract, streaming/cms.py):

* df/tf/N/Σdl are ADDITIVE across disjoint document batches, so a
  crash-replayed micro-batch would double-count — a batch-id LEDGER
  row (``\\x00batch:<id>``) inside the artifact makes the merge a
  no-op on replay, and ledger + stats travel in one atomic directory
  swap so they cannot diverge.
* Additivity needs each document to arrive exactly once (append-only
  corpus); `streaming.filter_gate` upstream provides first-arrival
  dedup for at-least-once sources.
* Unlike the fixed-width CMS, the vocabulary is unbounded, so the
  merge is a DISTRIBUTED groupBy-sum (never a driver collect) and the
  artifact is rewritten via the CDC module's sibling-temp-dir swap —
  a plan must not overwrite the parquet path it is reading.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from vectordbindexing_spark.plans.partitioning import local_rows_df

from vectordbindexing_spark.streaming.atomic import recover, swap_in
from vectordbindexing_spark.operators.retrieval import (
    RESERVED_PREFIX,
    lexical_stats,
)

LEDGER_PREFIX = RESERVED_PREFIX + "batch:"


def merge_lexical_batch(
    batch: DataFrame,
    batch_id: int,
    artifact_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> bool:
    """One foreachBatch step. Returns False when this batch_id is
    already in the artifact's ledger (crash replay) — artifact
    untouched."""
    spark = batch.sparkSession
    recover(artifact_path)  # promote a crash-orphaned complete temp dir
    stats = lexical_stats(batch, text_col=text_col, id_col=id_col)
    entry_term = f"{LEDGER_PREFIX}{batch_id}"
    entry = local_rows_df(
        spark, [(entry_term, 1, 0)], "term string, df long, tf long"
    )
    if os.path.exists(artifact_path):
        prev = spark.read.parquet(artifact_path)
        # ledger probe: pushed-down point filter, rows ∝ merged batches
        if prev.where(F.col("term") == entry_term).count() > 0:
            return False
        ledger = prev.where(F.col("term").startswith(LEDGER_PREFIX))
        counters = prev.where(~F.col("term").startswith(LEDGER_PREFIX))
        merged = (
            counters.unionByName(stats)
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"),
                 F.sum("tf").cast("long").alias("tf"))
        )
        out = merged.unionByName(ledger).unionByName(entry)
    else:
        out = stats.unionByName(entry)
    # crash-safe swap (streaming/atomic.py); counters + ledger move
    # together, recover() above closes the rmtree→rename window
    swap_in(out, artifact_path, coalesce=None)
    return True


def run_lexical_ingest(
    stream: DataFrame,
    artifact_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Attach the stats maintainer to a document stream; returns the
    StreamingQuery (caller awaits/stops)."""
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: merge_lexical_batch(
                b, bid, artifact_path, text_col=text_col, id_col=id_col
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def load_lexical_stats(spark, artifact_path: str) -> DataFrame:
    """Serving view of the artifact: ledger rows stripped."""
    return spark.read.parquet(artifact_path).where(
        ~F.col("term").startswith(LEDGER_PREFIX)
    )
