"""HyperLogLog sketch — python parity, accuracy bound, mergeability."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.hashing import det_hash60_py
from vectordbindexing_spark.operators.sketch import (
    HASH_BITS,
    hll_estimate,
    hll_registers,
    merge_registers,
)


def _py_registers(values, p):
    regs = {}
    rest_bits = HASH_BITS - p
    for v in values:
        h = det_hash60_py(str(v))
        idx = h >> rest_bits
        rest = h & ((1 << rest_bits) - 1)
        rho = rest_bits + 1 if rest == 0 else rest_bits - rest.bit_length() + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def test_registers_match_python(spark):
    vals = list(range(500)) + [7, 8, 9]  # duplicates must not matter
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r["bucket"]: r["max_rho"] for r in hll_registers(df, "x", p=8).collect()}
    assert got == _py_registers(vals, 8)


def test_null_values_ignored(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "x long")
    got = {r["bucket"]: r["max_rho"] for r in hll_registers(df, "x", p=8).collect()}
    assert got == _py_registers([1, 2], 8)


def test_estimate_within_error_bound(spark):
    n = 50_000
    df = spark.range(n).select((F.col("id") * 7 + 13).alias("x"))
    est = hll_estimate(df, "x", p=10).collect()[0]["distinct_estimate"]
    # 1.04/sqrt(1024) ~ 3.3% std error; allow 4 sigma
    assert abs(est - n) / n < 0.13


def test_small_range_linear_counting(spark):
    df = spark.range(20).select(F.col("id").alias("x"))
    row = hll_estimate(df, "x", p=10).collect()[0]
    assert row["zero_registers"] >= 1004
    # linear counting is near-exact at this occupancy
    assert abs(row["distinct_estimate"] - 20) < 2


def test_merge_equals_single_scan(spark):
    a = spark.range(0, 30_000).select(F.col("id").alias("x"))
    b = spark.range(20_000, 60_000).select(F.col("id").alias("x"))
    both = spark.range(0, 60_000).select(F.col("id").alias("x"))
    merged = merge_registers(
        hll_registers(a, "x", p=10), hll_registers(b, "x", p=10)
    )
    single = {r["bucket"]: r["max_rho"] for r in hll_registers(both, "x", p=10).collect()}
    got = {r["bucket"]: r["max_rho"] for r in merged.collect()}
    assert got == single


def test_p_bounds():
    with pytest.raises(ValueError):
        hll_registers(None, "x", p=3)


# ---------------- KMV ----------------


def _py_kmv(values, k):
    hs = sorted({det_hash60_py(str(v)) for v in values})
    return hs[:k]


def test_kmv_matches_python(spark):
    vals = [v % 300 for v in range(1000)]  # 300 distinct
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    from vectordbindexing_spark.operators.sketch import kmv_sketch

    got = [
        r["hval"]
        for r in kmv_sketch(df, "x", k=50).orderBy("rank").collect()
    ]
    assert got == _py_kmv(vals, 50)


def test_kmv_distinct_estimate_accuracy(spark):
    from vectordbindexing_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    n = 20_000
    df = spark.range(n).select((F.col("id") * 11 + 3).alias("x"))
    vals = [r["hval"] for r in kmv_sketch(df, "x", k=256).collect()]
    est = kmv_distinct_estimate(vals, 256)
    assert abs(est - n) / n < 0.25  # 1/sqrt(254) ~ 6.3%; 4 sigma
    # unsaturated sketch is exact
    small = spark.range(40).select(F.col("id").alias("x"))
    svals = [r["hval"] for r in kmv_sketch(small, "x", k=256).collect()]
    assert kmv_distinct_estimate(svals, 256) == 40.0


def test_kmv_overlap_estimates_jaccard(spark):
    from vectordbindexing_spark.operators.sketch import kmv_overlap, kmv_sketch

    a = spark.range(0, 10_000).select(F.col("id").alias("x"))
    b = spark.range(5_000, 15_000).select(F.col("id").alias("x"))
    ka = [r["hval"] for r in kmv_sketch(a, "x", k=256).collect()]
    kb = [r["hval"] for r in kmv_sketch(b, "x", k=256).collect()]
    j = kmv_overlap(ka, kb, 256)
    # true Jaccard = 5000/15000 = 1/3
    assert abs(j - 1 / 3) < 0.12


def test_grouped_registers_match_per_group_python(spark):
    rows = [("a", v) for v in range(200)] + [("b", v) for v in range(150, 400)]
    df = spark.createDataFrame(rows, "g string, x long")
    out = hll_registers(df, "x", p=8, group_col="g").collect()
    got = {}
    for r in out:
        got.setdefault(r["g"], {})[r["bucket"]] = r["max_rho"]
    assert got["a"] == _py_registers(range(200), 8)
    assert got["b"] == _py_registers(range(150, 400), 8)


def test_grouped_registers_merge_to_global(spark):
    rows = [("a", v) for v in range(200)] + [("b", v) for v in range(150, 400)]
    df = spark.createDataFrame(rows, "g string, x long")
    grouped = hll_registers(df, "x", p=8, group_col="g")
    rolled = {
        r["bucket"]: r["max_rho"]
        for r in merge_registers(grouped.drop("g")).collect()
    }
    direct = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(df, "x", p=8).collect()
    }
    assert rolled == direct  # one sketch pass serves every rollup


# ---------------- count-min ----------------


def _py_cms(values, depth, width):
    from collections import Counter

    c = Counter()
    for v in values:
        for j in range(depth):
            c[(j, det_hash60_py(f"{j}|{v}") % width)] += 1
    return dict(c)


def test_cms_counters_match_python(spark):
    vals = [str(v % 40) for v in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    from vectordbindexing_spark.operators.sketch import cms_counters

    got = {
        (r["sketch_row"], r["bucket"]): r["cnt"]
        for r in cms_counters(df, "x", depth=4, width=64).collect()
    }
    assert got == _py_cms(vals, 4, 64)


def test_cms_estimate_never_underestimates(spark):
    from collections import Counter

    from vectordbindexing_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    # zipf-ish: key i appears ~ 2000//(i+1) times -> forced collisions
    # at width 32 so the overestimate property actually gets exercised
    vals = [str(i) for i in range(100) for _ in range(2000 // (i + 1))]
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    sk = cms_counters(df, "x", depth=4, width=32)
    items = spark.createDataFrame([(k,) for k in truth], "x string")
    est = {
        r["x"]: r["est_count"]
        for r in cms_estimate(sk, items, "x", depth=4, width=32).collect()
    }
    assert set(est) == set(truth)
    for k, t in truth.items():
        assert est[k] >= t  # CMS never undercounts
    # heavy hitters stay accurate despite collisions: the top key's
    # overestimate is bounded by the expected collision mass e*N/width
    n = len(vals)
    assert est["0"] - truth["0"] <= 3 * n / 32


def test_cms_merge_equals_single_scan(spark):
    from vectordbindexing_spark.operators.sketch import cms_counters, cms_merge

    a = spark.createDataFrame([(str(v % 20),) for v in range(300)], "x string")
    b = spark.createDataFrame([(str(v % 30),) for v in range(200)], "x string")
    both = a.unionByName(b)
    merged = {
        (r["sketch_row"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            cms_counters(a, "x", depth=4, width=64),
            cms_counters(b, "x", depth=4, width=64),
        ).collect()
    }
    single = {
        (r["sketch_row"], r["bucket"]): r["cnt"]
        for r in cms_counters(both, "x", depth=4, width=64).collect()
    }
    assert merged == single


# ---------------- log-histogram quantiles ----------------


def test_log_histogram_buckets_match_python(spark):
    vals = [0.0, 0.001, 0.5, 1.0, 3.7, 100.25, -0.25, -64.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    from vectordbindexing_spark.operators.sketch import log_histogram

    got = {r["bucket"]: r["n"] for r in log_histogram(df, "x", scale=1000).collect()}
    exp = {}
    for v in vals:
        iv = int(round(v * 1000.0))  # python round-half-even vs spark
        # half-away never differs here (no .5 cases in the fixture)
        b = 0 if iv == 0 else (iv.bit_length() if iv > 0 else -((-iv).bit_length()))
        exp[b] = exp.get(b, 0) + 1
    assert got == exp


def test_log_histogram_quantiles_relative_error(spark):
    import random

    rng = random.Random(7)
    vals = [rng.lognormvariate(2.0, 1.5) for _ in range(20_000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    from vectordbindexing_spark.operators.sketch import log_histogram_quantiles

    out = {
        r["q"]: r["est_value"]
        for r in log_histogram_quantiles(df, "x", [0.5, 0.9, 0.99]).collect()
    }
    svals = sorted(vals)
    for q in (0.5, 0.9, 0.99):
        true = svals[max(0, math.ceil(q * len(vals)) - 1)]
        # gamma=2 buckets: estimate within one bucket => factor-of-2
        assert true / 2 <= out[q] <= true * 2, (q, out[q], true)


def test_log_histogram_merge(spark):
    from pyspark.sql import functions as SF

    from vectordbindexing_spark.operators.sketch import log_histogram

    a = spark.range(1, 5000).select((SF.col("id") * 0.013).alias("x"))
    b = spark.range(1, 3000).select((SF.col("id") * 0.031).alias("x"))
    ha = {r["bucket"]: r["n"] for r in log_histogram(a, "x").collect()}
    hb = {r["bucket"]: r["n"] for r in log_histogram(b, "x").collect()}
    merged = {k: ha.get(k, 0) + hb.get(k, 0) for k in set(ha) | set(hb)}
    both = a.unionByName(b)
    single = {r["bucket"]: r["n"] for r in log_histogram(both, "x").collect()}
    assert merged == single


def test_kmv_pairwise_overlap_matches_python_twin(spark):
    from vectordbindexing_spark.operators.sketch import (
        kmv_overlap,
        kmv_pairwise_overlap,
        kmv_sketch,
    )

    rows = (
        [("a", i) for i in range(300)]
        + [("b", i) for i in range(150, 450)]
        + [("c", i) for i in range(1000, 1300)]
    )
    df = spark.createDataFrame(rows, "g string, x long")
    got = {
        (r["group_a"], r["group_b"]): (r["n_shared"], r["n_union"], r["jaccard"])
        for r in kmv_pairwise_overlap(df, "x", "g", k=64).collect()
    }
    sk = kmv_sketch(df, "x", k=64, group_col="g").collect()
    by_g = {}
    for r in sk:
        by_g.setdefault(r["g"], []).append(r["hval"])
    import itertools

    for ga, gb in itertools.combinations(sorted(by_g), 2):
        jac = kmv_overlap(by_g[ga], by_g[gb], 64)
        assert round(jac, 6) == got[(ga, gb)][2], (ga, gb)
    # disjoint sources estimate 0; a/b truly overlap
    assert got[("a", "c")][0] == 0
    assert got[("a", "b")][0] > 0


def test_kmv_grouped(spark):
    rows = [("a", i) for i in range(100)] + [("b", i) for i in range(50, 150)]
    df = spark.createDataFrame(rows, "g string, x long")
    from vectordbindexing_spark.operators.sketch import kmv_sketch

    out = kmv_sketch(df, "x", k=30, group_col="g").collect()
    ga = sorted(r["hval"] for r in out if r["g"] == "a")
    gb = sorted(r["hval"] for r in out if r["g"] == "b")
    assert ga == _py_kmv(range(100), 30)
    assert gb == _py_kmv(range(50, 150), 30)


def test_cms_estimate_ignores_null_items(spark):
    from vectordbindexing_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    vals = [str(v % 10) for v in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    sk = cms_counters(df, "x", depth=4, width=64)
    items = spark.createDataFrame([("3",), (None,)], "x string")
    out = cms_estimate(sk, items, "x", depth=4, width=64).collect()
    assert {r["x"] for r in out} == {"3"}  # NULL probe produces no row
