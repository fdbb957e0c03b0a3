"""Stream-stream interval join (conversion attribution): the streaming
run over a replayed parquet feed must be row-identical to the batch
twin (same function, same expressions), state stays bounded by the
watermark, and last-touch selection is deterministic."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.streaming.attribution import (
    attribution_pairs,
    last_touch,
)


def _events(spark):
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: click at 0 and 20, purchase at 25 → both clicks within
        # 30 min; last-touch = click at 20
        (1, ts(0), 1, "click"),
        (2, ts(20), 1, "click"),
        (3, ts(25), 1, "purchase"),
        # user 1: a second purchase at 55 → only the click at 20 is
        # within 30 min? 55-20=35 > 30 → no attribution
        (4, ts(56), 1, "purchase"),
        # user 2: click AFTER the purchase → never attributes
        (5, ts(10), 2, "purchase"),
        (6, ts(11), 2, "click"),
        # user 2: exact-boundary pair (delay == max_delay) → included
        (7, ts(30), 2, "click"),
        (8, ts(60), 2, "purchase"),
        # user 3: tie — two clicks at the same timestamp, last_touch
        # breaks to the lowest exposure_id
        (9, ts(40), 3, "click"),
        (10, ts(40), 3, "click"),
        (11, ts(50), 3, "purchase"),
    ]
    return spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long, event_type string"
    )


def _run_batch(ev):
    pairs = attribution_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        max_delay="30 minutes",
    )
    return pairs


def test_batch_semantics(spark):
    pairs = _run_batch(_events(spark)).collect()
    got = {
        (r["exposure_id"], r["conversion_id"], r["delay_seconds"])
        for r in pairs
    }
    assert got == {
        (1, 3, 25 * 60),
        (2, 3, 5 * 60),
        (7, 8, 30 * 60),  # boundary inclusive
        (9, 11, 10 * 60),
        (10, 11, 10 * 60),
    }
    lt = {
        (r["conversion_id"], r["exposure_id"])
        for r in last_touch(_run_batch(_events(spark))).collect()
    }
    assert lt == {(3, 2), (8, 7), (11, 9)}  # tie → lowest exposure_id


def test_stream_matches_batch(spark, tmp_path):
    """Replay the same events through readStream: the watermarked
    stream-stream join must produce exactly the batch pairs."""
    ev = _events(spark)
    src = str(tmp_path / "feed")
    # two files so the stream sees multiple input splits
    ev.filter(F.col("event_id") <= 6).write.parquet(src + "/a")
    ev.filter(F.col("event_id") > 6).write.parquet(src + "/b")
    stream = spark.readStream.schema(ev.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    pairs = attribution_pairs(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        max_delay="30 minutes",
        watermark="10 minutes",
    )
    q = (
        pairs.writeStream.format("memory")
        .queryName("attr_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT exposure_id, conversion_id, delay_seconds FROM attr_pairs"
        ).collect()
    }
    want = {
        (r["exposure_id"], r["conversion_id"], r["delay_seconds"])
        for r in _run_batch(ev).collect()
    }
    assert got == want


def test_ntz_input_tolerated(spark):
    """The driver's events parquet reads as TIMESTAMP_NTZ — the operator
    must cast and still produce integer delays."""
    ev = _events(spark).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = _run_batch(ev)
    assert dict(out.dtypes)["delay_seconds"] == "bigint"
    assert out.count() == 5
    # output ts columns come back in the input's type
    assert dict(out.dtypes)["exposure_ts"] == "timestamp_ntz"
