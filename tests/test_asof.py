"""As-of join: point-in-time semantics, tie rules, strict mode, plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vectordbindexing_spark.operators.events import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_picks_latest_at_or_before(spark):
    probe = _mk(spark, [(1, 100, _ts(10)), (2, 100, _ts(3))],
                "pid long, user_id long, ts timestamp")
    build = _mk(
        spark,
        [(100, _ts(1), 11.0), (100, _ts(5), 22.0), (100, _ts(9), 33.0)],
        "user_id long, ts timestamp, px double",
    )
    out = {r["pid"]: r["px"] for r in
           asof_join(probe, build, value_cols=["px"]).collect()}
    assert out == {1: 33.0, 2: 11.0}


def test_equal_timestamp_included_then_strict(spark):
    probe = _mk(spark, [(1, 7, _ts(5))], "pid long, user_id long, ts timestamp")
    build = _mk(spark, [(7, _ts(5), 50.0), (7, _ts(2), 20.0)],
                "user_id long, ts timestamp, px double")
    eq = asof_join(probe, build, value_cols=["px"]).collect()[0]["px"]
    strict = asof_join(
        probe, build, value_cols=["px"], allow_equal=False
    ).collect()[0]["px"]
    assert eq == 50.0
    assert strict == 20.0


def test_no_preceding_build_gives_null(spark):
    probe = _mk(spark, [(1, 9, _ts(1))], "pid long, user_id long, ts timestamp")
    build = _mk(spark, [(9, _ts(8), 1.0)], "user_id long, ts timestamp, px double")
    row = asof_join(probe, build, value_cols=["px"]).collect()[0]
    assert row["px"] is None
    assert row["pid"] == 1  # left semantics: probe row survives


def test_key_isolation(spark):
    probe = _mk(spark, [(1, 1, _ts(9)), (2, 2, _ts(9))],
                "pid long, user_id long, ts timestamp")
    build = _mk(spark, [(1, _ts(1), 10.0)], "user_id long, ts timestamp, px double")
    out = {r["pid"]: r["px"] for r in
           asof_join(probe, build, value_cols=["px"]).collect()}
    assert out == {1: 10.0, 2: None}


def test_same_instant_build_tie_max_payload_wins(spark):
    probe = _mk(spark, [(1, 4, _ts(6))], "pid long, user_id long, ts timestamp")
    build = _mk(spark, [(4, _ts(6), 1.0), (4, _ts(6), 2.0)],
                "user_id long, ts timestamp, px double")
    assert asof_join(probe, build, value_cols=["px"]).collect()[0]["px"] == 2.0


def test_value_col_collision_raises(spark):
    probe = _mk(spark, [(1, 4, _ts(6))], "px long, user_id long, ts timestamp")
    build = _mk(spark, [(4, _ts(6), 1.0)], "user_id long, ts timestamp, px double")
    import pytest

    with pytest.raises(ValueError):
        asof_join(probe, build, value_cols=["px"])


def test_randomized_matches_python_reference(spark):
    import random

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        probe = [(i, rng.randint(0, 5), _ts(rng.randint(0, 50)))
                 for i in range(80)]
        build = [(rng.randint(0, 5), _ts(rng.randint(0, 50)), float(i))
                 for i in range(60)]
        pdf = _mk(spark, probe, "pid long, user_id long, ts timestamp")
        bdf = _mk(spark, build, "user_id long, ts timestamp, px double")
        got = {r["pid"]: r["px"] for r in
               asof_join(pdf, bdf, value_cols=["px"]).collect()}

        def ref(u, t):
            cand = [(ts, px) for (bu, ts, px) in build
                    if bu == u and ts <= t]
            if not cand:
                return None
            # max ts; among equal ts the max payload wins
            return max(cand)[1]

        want = {pid: ref(u, t) for pid, u, t in probe}
        assert got == want, f"seed {seed}"


def test_plan_is_single_window_no_nested_loop(spark):
    probe = spark.range(100).select(
        F.col("id").alias("pid"), (F.col("id") % 5).alias("user_id"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    )
    build = spark.range(50).select(
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_micros(F.col("id") * 2_000_000).alias("ts"),
        F.col("id").cast("double").alias("px"),
    )
    plan = asof_join(probe, build, value_cols=["px"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Window") == 1
