"""Streamed hour rollup == batch hour rollup; coarser grains reuse it."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vectordbindexing_spark.operators.events import (
    coarsen_rollup,
    multires_rollup,
)
from vectordbindexing_spark.streaming.rollup import hourly_rollup_stream


def _events(spark):
    rows = []
    base = dt.datetime(2024, 3, 4, 0, 0, 0)
    for i in range(120):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=i * 17 % (72 * 60)),
                "click" if i % 3 else "view",
                (i % 16) / 4.0,  # binary-exact values: sums carry no
            )                    # rounding slack, equality is exact
        )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def _key(r):
    return (r["event_type"], r["bucket"], r["n_events"], r["sum_value"])


def test_stream_hour_matches_batch(spark, tmp_path):
    """Two availableNow runs against one checkpoint: the second run
    feeds a far-future flush sentinel, so the watermark passes every
    real hour and append mode emits the complete hour table — the
    restart also exercises state recovery."""
    ev = _events(spark)
    src = str(tmp_path / "feed")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(src + "/a")
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(src + "/b")

    def run():
        stream = spark.readStream.schema(ev.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(src)
        q = (
            hourly_rollup_stream(stream, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    flush = dt.datetime(2024, 3, 20)  # far past every window + watermark
    spark.createDataFrame(
        [(999, flush, "flush_sentinel", 0.0)], _events(spark).schema
    ).write.parquet(src + "/c")
    run()
    got = {
        _key(r)
        for r in spark.read.parquet(sink)
        .filter(F.col("event_type") != "flush_sentinel")
        .collect()
    }
    want = {
        _key(r)
        for r in multires_rollup(ev).filter(
            F.col("resolution") == "hour"
        ).collect()
    }
    assert got == want


def test_batch_twin_identical(spark):
    ev = _events(spark)
    got = {_key(r) for r in hourly_rollup_stream(ev).collect()}
    want = {
        _key(r)
        for r in multires_rollup(ev).filter(
            F.col("resolution") == "hour"
        ).collect()
    }
    assert got == want


def test_coarsen_streamed_sink_matches_batch_ladder(spark):
    ev = _events(spark)
    hour = hourly_rollup_stream(ev)  # batch twin of the streamed sink
    day = coarsen_rollup(hour, "day")
    want = {
        _key(r)
        for r in multires_rollup(ev).filter(
            F.col("resolution") == "day"
        ).collect()
    }
    assert {_key(r) for r in day.collect()} == want
