"""Bucketized range join: exactness vs brute force, boundaries, plan."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.ranges import point_in_interval_join


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def _pts(spark, secs):
    return spark.createDataFrame(
        [(i, _t(s)) for i, s in enumerate(secs)], "pid long, ts timestamp"
    )


def _ivs(spark, spans):
    return spark.createDataFrame(
        [(i, _t(a), _t(b)) for i, (a, b) in enumerate(spans)],
        "iid long, start_ts timestamp, end_ts timestamp",
    )


def test_boundaries_inclusive_and_bucket_crossing(spark):
    pts = _pts(spark, [0, 50, 100, 101, 250])
    ivs = _ivs(spark, [(50, 100), (99, 260)])  # bucket=60s -> crosses
    got = {
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            pts, ivs, bucket_seconds=60
        ).collect()
    }
    assert got == {(1, 0), (2, 0), (2, 1), (3, 1), (4, 1)}


def test_left_join_keeps_unmatched(spark):
    pts = _pts(spark, [0, 500])
    ivs = _ivs(spark, [(400, 600)])
    rows = point_in_interval_join(
        pts, ivs, bucket_seconds=60, how="left"
    ).collect()
    by_pid = {r["pid"]: r["iid"] for r in rows}
    assert by_pid == {0: None, 1: 0}


def test_inverted_intervals_dropped(spark):
    pts = _pts(spark, [10])
    ivs = _ivs(spark, [(100, 50)])  # end < start: must NOT match
    assert point_in_interval_join(pts, ivs, bucket_seconds=60).count() == 0


def test_column_collision_raises(spark):
    pts = _pts(spark, [0])
    with pytest.raises(ValueError):
        point_in_interval_join(pts, pts.withColumnRenamed("pid", "x"))


def test_matches_brute_force_random(spark):
    rng = random.Random(5)
    secs = [rng.randint(0, 3600) for _ in range(150)]
    spans = []
    for _ in range(60):
        a = rng.randint(0, 3600)
        spans.append((a, a + rng.randint(0, 900)))
    pts, ivs = _pts(spark, secs), _ivs(spark, spans)
    for bucket in (60, 600, 3600):
        got = {
            (r["pid"], r["iid"])
            for r in point_in_interval_join(
                pts, ivs, bucket_seconds=bucket
            ).collect()
        }
        want = {
            (pi, ii)
            for pi, s in enumerate(secs)
            for ii, (a, b) in enumerate(spans)
            if a <= s <= b
        }
        assert got == want, f"bucket={bucket}"


def test_plan_is_equi_join_not_nested_loop(spark):
    pts = _pts(spark, range(100))
    ivs = _ivs(spark, [(i, i + 120) for i in range(50)])
    plan = point_in_interval_join(
        pts, ivs, bucket_seconds=60
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)
