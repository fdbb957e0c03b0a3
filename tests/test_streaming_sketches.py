"""Streamed HLL register artifact == batch sketch; replay idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordbindexing_spark.operators.sketch import hll_registers
from vectordbindexing_spark.streaming.sketches import (
    merge_hll_batch,
    run_hll_ingest,
)


def _regs(df):
    return {(r["bucket"], r["max_rho"]) for r in df.collect()}


def test_streamed_artifact_matches_batch(spark, tmp_path):
    data = spark.range(2000).select((F.col("id") * 13 + 5).alias("x"))
    src = str(tmp_path / "feed")
    data.filter(F.col("x") % 2 == 0).write.parquet(src + "/a")
    data.filter(F.col("x") % 2 == 1).write.parquet(src + "/b")
    art = str(tmp_path / "regs")
    stream = spark.readStream.schema(data.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    q = run_hll_ingest(
        stream, art, str(tmp_path / "ckpt"), col="x", p=9
    )
    q.awaitTermination(120)
    got = _regs(spark.read.parquet(art))
    want = _regs(hll_registers(data, "x", p=9))
    assert got == want


def test_replay_is_idempotent(spark, tmp_path):
    data = spark.range(500).select(F.col("id").alias("x"))
    art = str(tmp_path / "regs")
    merge_hll_batch(data, art, "x", p=9)
    once = _regs(spark.read.parquet(art))
    merge_hll_batch(data, art, "x", p=9)  # crash-replay of same batch
    assert _regs(spark.read.parquet(art)) == once
    assert once == _regs(hll_registers(data, "x", p=9))


def test_incremental_merge_accumulates(spark, tmp_path):
    a = spark.range(0, 300).select(F.col("id").alias("x"))
    b = spark.range(300, 900).select(F.col("id").alias("x"))
    art = str(tmp_path / "regs")
    merge_hll_batch(a, art, "x", p=9)
    merge_hll_batch(b, art, "x", p=9)
    both = spark.range(0, 900).select(F.col("id").alias("x"))
    assert _regs(spark.read.parquet(art)) == _regs(
        hll_registers(both, "x", p=9)
    )


def test_empty_batches_do_not_crash(spark, tmp_path):
    art = str(tmp_path / "regs")
    empty = spark.createDataFrame([], "x long")
    merge_hll_batch(empty, art, "x", p=9)   # writes empty artifact
    merge_hll_batch(empty, art, "x", p=9)   # read+overwrite same path
    assert spark.read.parquet(art).count() == 0
    data = spark.range(100).select(F.col("id").alias("x"))
    merge_hll_batch(data, art, "x", p=9)    # recovers into real sketch
    assert _regs(spark.read.parquet(art)) == _regs(
        hll_registers(data, "x", p=9)
    )
