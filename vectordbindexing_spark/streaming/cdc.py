"""Streaming CDC maintenance — a current-state table kept by
foreachBatch upserts, emitting a change log per micro-batch.

This is the MERGE INTO / change-data-feed shape (Delta CDF,
Debezium sink): each micro-batch carries the latest row versions for
some keys (NULL-marked tombstones delete); the maintainer diffs them
against the stored snapshot with operators.diff.snapshot_diff's
null-safe comparison, appends the classified changes (added /
changed / removed) to a change log, and rewrites the snapshot.

Scale posture: the snapshot rewrite is the honest cost of a
format-agnostic parquet sink — with a real table format (Delta/
Iceberg) the same logic becomes MERGE INTO and only touched files
rewrite. The diff itself is one key-shuffle join of batch × snapshot,
and the change log is append-only. Batches are deduplicated to one
row per key (greatest ``version_col``) before merging, so replays
and intra-batch churn collapse deterministically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.diff import snapshot_diff
from vectordbindexing_spark.streaming.atomic import recover, swap_in


def latest_per_key(
    batch: DataFrame, keys: list[str], version_col: str
) -> DataFrame:
    """One row per key: greatest version wins; ties break by the
    row's full struct (total, deterministic)."""
    others = [c for c in batch.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.struct(*others).desc()
    )
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_cdc_batch(
    batch: DataFrame,
    snapshot_path: str,
    changelog_path: str,
    keys: list[str],
    *,
    version_col: str = "version",
    tombstone_col: str = "deleted",
) -> None:
    """One foreachBatch step: dedupe the batch to latest-per-key,
    split out tombstones, diff against the stored snapshot, append
    the change log, rewrite the snapshot."""
    spark = batch.sparkSession
    recover(snapshot_path)  # promote a crash-orphaned complete temp dir
    latest = latest_per_key(batch, keys, version_col)
    dels = latest.filter(F.col(tombstone_col)).select(*keys)
    ups = latest.filter(~F.col(tombstone_col)).drop(tombstone_col)
    if os.path.exists(snapshot_path):
        old = spark.read.parquet(snapshot_path)
    else:
        old = spark.createDataFrame([], ups.schema)
    # next state: old rows not deleted and not upserted + upserts
    keep = old.join(dels, keys, "left_anti").join(ups, keys, "left_anti")
    new = keep.unionByName(ups)
    changes = snapshot_diff(
        old, new, keys, compare_cols=[c for c in ups.columns
                                      if c not in keys and c != version_col]
    )
    # the change log only READS the old snapshot — append directly
    changes.write.mode("append").parquet(changelog_path)
    # the snapshot must not overwrite the path its own plan reads:
    # write the next state to a sibling temp dir and swap
    # (streaming/atomic.py — recover() at entry promotes a complete
    # temp dir orphaned by a crash between the swap's two metadata
    # ops; the streaming checkpoint replays the batch after a crash,
    # and latest-per-key dedupe makes that replay idempotent. With a
    # real table format this whole function is MERGE INTO + CDF.)
    swap_in(new, snapshot_path, coalesce=None)


def run_cdc_ingest(
    stream: DataFrame,
    snapshot_path: str,
    changelog_path: str,
    checkpoint: str,
    keys: list[str],
    *,
    version_col: str = "version",
    tombstone_col: str = "deleted",
):
    """Attach the CDC maintainer to a stream; returns the
    StreamingQuery (caller awaits/stops)."""
    return (
        stream.writeStream.foreachBatch(
            lambda b, _id: merge_cdc_batch(
                b, snapshot_path, changelog_path, keys,
                version_col=version_col, tombstone_col=tombstone_col,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
