"""Streaming sketch maintenance — a live HLL register artifact kept
up to date by foreachBatch merges.

Sketches are the canonical streaming aggregate: the register table is
AT MOST 2^p rows no matter how long the stream runs, and max-merge is
IDEMPOTENT — replaying a micro-batch after a crash cannot corrupt the
sketch (max(a, a) = a), so the artifact needs no transactional sink.
Each micro-batch runs the BATCH operator (sketch.hll_registers — same
md5 hashing, same integer rho), max-merges with the stored register
table, and atomically replaces it; a streamed artifact is therefore
bit-identical to the batch sketch of the same data, which is what
lets a 100 TB pipeline mix backfill (batch) and live (stream) sketch
builds freely. Same shape as streaming/ivfpq_ingest: tiny artifact,
bounded per-batch work, restart-safe.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame

from vectordbindexing_spark.operators.sketch import (
    hll_registers,
    merge_registers,
)
from vectordbindexing_spark.streaming.atomic import recover, swap_in
from vectordbindexing_spark.plans.partitioning import local_rows_df


def merge_hll_batch(
    batch: DataFrame, artifact_path: str, col: str | Column, p: int = 10
) -> None:
    """One foreachBatch step: sketch the micro-batch with the batch
    operator, max-merge into the stored register table, replace the
    artifact. Idempotent under replay (max-merge)."""
    spark = batch.sparkSession
    recover(artifact_path)  # promote a crash-orphaned complete temp dir
    regs = hll_registers(batch, col, p)
    if os.path.exists(artifact_path):
        prev = spark.read.parquet(artifact_path)
        regs = merge_registers(prev, regs)
    # the register table is <= 2^p rows: collect-and-rewrite is
    # driver-bounded by the sketch size, never by the stream. The
    # rewrite MUST be from collected rows, never from `regs` itself —
    # its plan reads the artifact path being overwritten (an empty
    # localized frame keeps the write legal when rows == [])
    rows = regs.collect()
    out = local_rows_df(spark, rows, regs.schema)
    # crash-safe swap (streaming/atomic.py): max-merge makes REPLAY
    # idempotent, but an in-place mode('overwrite') is delete-then-
    # write — a crash mid-write would still lose the whole accumulated
    # register history
    swap_in(out, artifact_path)


def run_hll_ingest(
    stream: DataFrame,
    artifact_path: str,
    checkpoint: str,
    col: str = "user_id",
    p: int = 10,
):
    """Attach the register-artifact maintainer to a stream; returns
    the StreamingQuery (caller awaits/stops)."""
    return (
        stream.writeStream.foreachBatch(
            lambda b, _id: merge_hll_batch(b, artifact_path, col, p)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
