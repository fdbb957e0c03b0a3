"""Bloom filter bit-table + multi-resolution rollup ladder."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vectordbindexing_spark.functions.hashing import det_hash60_py
from vectordbindexing_spark.operators.events import multires_rollup
from vectordbindexing_spark.operators.sketch import (
    bloom_bits,
    bloom_might_contain,
)


def _py_bits(values, m, k):
    return sorted(
        {det_hash60_py(f"{j}|{v}") % m for v in values for j in range(k)}
    )


def test_bits_match_python(spark):
    vals = list(range(100))
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = sorted(
        r["bit"] for r in bloom_bits(df, "x", m_bits=512, k_hashes=4).collect()
    )
    assert got == _py_bits(vals, 512, 4)


def test_no_false_negatives(spark):
    members = spark.range(200).select(F.col("id").alias("x"))
    bits = bloom_bits(members, "x", m_bits=1024, k_hashes=3)
    probe = spark.range(1000).select(F.col("id").alias("x"))
    passed = {
        r["x"]
        for r in bloom_might_contain(
            bits, probe, "x", m_bits=1024, k_hashes=3
        ).collect()
    }
    assert set(range(200)) <= passed  # every member passes
    # and the filter actually prunes most non-members at this m/k/n
    assert len(passed) < 600


def test_union_merge_is_bit_or(spark):
    a = spark.range(0, 50).select(F.col("id").alias("x"))
    b = spark.range(40, 90).select(F.col("id").alias("x"))
    both = spark.range(0, 90).select(F.col("id").alias("x"))
    merged = (
        bloom_bits(a, "x", m_bits=256, k_hashes=3)
        .unionByName(bloom_bits(b, "x", m_bits=256, k_hashes=3))
        .distinct()
    )
    single = {r["bit"] for r in bloom_bits(both, "x", m_bits=256, k_hashes=3).collect()}
    assert {r["bit"] for r in merged.collect()} == single


def test_probe_plan_broadcasts_bits(spark):
    members = spark.range(100).select(F.col("id").alias("x"))
    bits = bloom_bits(members, "x", m_bits=1024, k_hashes=3)
    probe = spark.range(500).select(F.col("id").alias("x"))
    plan = bloom_might_contain(
        bits, probe, "x", m_bits=1024, k_hashes=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------- multires rollup ----------------


def _ev(spark):
    rows = []
    base = dt.datetime(2024, 3, 4, 0, 0, 0)  # a Monday
    for i in range(200):
        rows.append(
            (i, base + dt.timedelta(hours=i % 50, minutes=i % 7),
             "click" if i % 3 else "view", float(i % 11) + 0.25)
        )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_rollup_hierarchy_consistent(spark):
    out = multires_rollup(_ev(spark)).collect()
    by_res = {}
    for r in out:
        by_res.setdefault(r["resolution"], []).append(r)
    assert set(by_res) == {"hour", "day", "week"}
    for res in ("hour", "day", "week"):
        tot_n = sum(r["n_events"] for r in by_res[res])
        assert tot_n == 200  # every grain partitions all events
    # day sums equal the (rounded) sum of their hours
    hours = {}
    for r in by_res["hour"]:
        d = (r["event_type"], r["bucket"].date())
        hours.setdefault(d, 0.0)
        hours[d] += r["sum_value"]
    for r in by_res["day"]:
        assert abs(hours[(r["event_type"], r["bucket"].date())]
                   - r["sum_value"]) < 1e-6


def test_rollup_hour_matches_direct_groupby(spark):
    ev = _ev(spark)
    direct = {
        (r["event_type"], r["hour"]): r["n"]
        for r in ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        (r["event_type"], r["bucket"]): r["n_events"]
        for r in multires_rollup(ev).filter(
            F.col("resolution") == "hour"
        ).collect()
    }
    assert got == direct
