"""Streaming count-min maintenance — a live frequency-sketch artifact
with EXACTLY-ONCE batch accounting.

The contrast with the HLL maintainer (streaming/sketches.py) is the
point of this module: HLL registers MAX-merge, so crash-replay of a
micro-batch is harmlessly idempotent and the artifact needs no
transaction. CMS counters ADD under merge — replaying a batch after a
crash between "artifact written" and "checkpoint committed" would
DOUBLE-COUNT every token in it. The standard fix (Structured
Streaming's idempotent-sink contract) is a batch-id ledger carried
inside the artifact itself:

* the counter parquet stores an extra bookkeeping row
  ``(sketch_row = -1, bucket = batch_id, cnt = 1)`` per merged batch;
* ``merge_cms_batch`` first checks the ledger — if this ``batch_id``
  is already recorded, the merge is a NO-OP (the previous attempt
  completed its write; only the checkpoint commit was lost);
* artifact + ledger are written TOGETHER via the crash-safe
  temp-dir swap + orphan recovery of :mod:`streaming.atomic`, so they
  cannot diverge from each other and a crash at ANY point never
  destroys the accumulated state — Spark's ``mode("overwrite")`` alone
  is delete-then-write, which would lose both counters and ledger if
  the writer died between the two.

The artifact stays ≤ depth·width + n_batches rows; like the HLL
maintainer, each micro-batch runs the BATCH operator so a streamed
sketch is counter-identical to the batch sketch of the same rows, and
backfill/live builds mix freely.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from vectordbindexing_spark.plans.partitioning import local_rows_df

from vectordbindexing_spark.operators.sketch import cms_counters, cms_merge
from vectordbindexing_spark.streaming.atomic import recover, swap_in

LEDGER_ROW = -1  # sketch_row value reserved for batch-id bookkeeping


def split_artifact(art: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(counters, ledger) views of a stored artifact."""
    return (
        art.where(F.col("sketch_row") != LEDGER_ROW),
        art.where(F.col("sketch_row") == LEDGER_ROW),
    )


def merge_cms_batch(
    batch: DataFrame,
    batch_id: int,
    artifact_path: str,
    col: str | Column,
    *,
    depth: int = 4,
    width: int = 1024,
) -> bool:
    """One foreachBatch step. Returns False when the batch was already
    merged (crash-replay) and the artifact is left untouched."""
    spark = batch.sparkSession
    recover(artifact_path)  # promote a crash-orphaned complete temp dir
    prev_rows = []
    if os.path.exists(artifact_path):
        prev = spark.read.parquet(artifact_path)
        # driver-bounded by sketch size + batch count, never the stream
        prev_rows = prev.collect()
        if any(
            r["sketch_row"] == LEDGER_ROW and r["bucket"] == batch_id
            for r in prev_rows
        ):
            return False  # replayed batch: write completed last time
    sketch = cms_counters(batch, col, depth=depth, width=width)
    if prev_rows:
        prev_local = local_rows_df(spark, prev_rows, sketch.schema)
        counters, ledger = split_artifact(prev_local)
        merged = cms_merge(counters, sketch)
    else:
        ledger = None
        merged = sketch
    entry = local_rows_df(
        spark, [(LEDGER_ROW, batch_id, 1)],
        "sketch_row long, bucket long, cnt long",
    )
    out = merged.unionByName(entry)
    if ledger is not None:
        out = out.unionByName(ledger)
    # counters AND ledger swap in together; the old artifact survives
    # until the replacement is fully on disk (mode('overwrite') on the
    # live path would delete-then-write and a mid-write crash would
    # lose ALL accumulated counters plus the ledger protecting them)
    swap_in(out, artifact_path)
    return True


def run_cms_ingest(
    stream: DataFrame,
    artifact_path: str,
    checkpoint: str,
    col: str = "tok",
    *,
    depth: int = 4,
    width: int = 1024,
):
    """Attach the counter-artifact maintainer to a stream; returns the
    StreamingQuery (caller awaits/stops)."""
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: merge_cms_batch(
                b, bid, artifact_path, col, depth=depth, width=width
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
