"""Streaming funnel: last emission per user == batch funnel_steps."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vectordbindexing_spark.operators.events import funnel_steps
from vectordbindexing_spark.streaming.funnel import _chain, funnel_stream

STEPS = ["view", "click", "purchase"]


def _events(spark):
    rows = []
    base = dt.datetime(2024, 3, 4)
    for i in range(90):
        rows.append(
            (i, i % 12,
             STEPS[i % 3] if i % 4 else "error",
             base + dt.timedelta(minutes=(i * 37) % 300))
        )
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def _us(t):
    return None if t is None else int(t.timestamp() * 1_000_000)


def test_stream_final_state_matches_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "feed")
    # split by time so cross-batch state accumulation is exercised
    ev.filter(F.col("event_id") < 45).write.parquet(src + "/a")
    ev.filter(F.col("event_id") >= 45).write.parquet(src + "/b")
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).option("recursiveFileLookup", "true").parquet(src)
    q = (
        funnel_stream(stream, STEPS)
        .writeStream.format("memory").queryName("funnel_updates")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # keep each user's LAST emission (update-mode stream of revisions)
    got = {}
    best = {}
    for r in spark.sql("SELECT * FROM funnel_updates").collect():
        if r["revision"] >= best.get(r["user_id"], 0):
            best[r["user_id"]] = r["revision"]
            got[r["user_id"]] = (
                r["step_1_us"], r["step_2_us"], r["step_3_us"], r["completed"]
            )
    want = {
        r["user_id"]: (
            _us(r["step_1_ts"]), _us(r["step_2_ts"]), _us(r["step_3_ts"]),
            r["completed"],
        )
        for r in funnel_steps(ev, STEPS).collect()
    }
    assert got == want


def test_chain_recurrence():
    # step2 exact when a kept ts clears the window
    assert _chain([[5], [3, 7], [8]]) == [5, 7, 8]
    # no step-1 -> nothing downstream
    assert _chain([[], [1], [2]]) == [None, None, None]
    # step-2 events all before step-1 -> drop-off
    assert _chain([[5], [1, 2], [9]]) == [5, None, None]
    # equal timestamp counts (at-or-after)
    assert _chain([[4], [4], [4]]) == [4, 4, 4]


def test_out_of_order_retraction_within_k(spark, tmp_path):
    # batch 2 delivers an EARLIER view that retroactively moves the
    # click window — the K-min state makes the correction exact
    base = dt.datetime(2024, 3, 4)

    def t(m):
        return base + dt.timedelta(minutes=m)

    b1 = [(1, 1, "view", t(60)), (2, 1, "click", t(70))]
    b2 = [(3, 1, "view", t(10)), (4, 1, "click", t(20))]
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    src = str(tmp_path / "feed")
    spark.createDataFrame(b1, schema).write.parquet(src + "/a")
    spark.createDataFrame(b2, schema).write.parquet(src + "/b")
    stream = spark.readStream.schema(
        spark.createDataFrame(b1, schema).schema
    ).option("maxFilesPerTrigger", 1).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    q = (
        funnel_stream(stream, ["view", "click"])
        .writeStream.format("memory").queryName("funnel_ooo")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    last = {}
    best = {}
    for r in spark.sql("SELECT * FROM funnel_ooo").collect():
        if r["revision"] >= best.get(r["user_id"], 0):
            best[r["user_id"]] = r["revision"]
            last[r["user_id"]] = (r["step_1_us"], r["step_2_us"])
    ev = spark.createDataFrame(b1 + b2, schema)
    want = {
        r["user_id"]: (_us(r["step_1_ts"]), _us(r["step_2_ts"]))
        for r in funnel_steps(ev, ["view", "click"]).collect()
    }
    assert last == want  # final view@10 -> click@20, corrected
