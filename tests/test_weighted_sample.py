"""Temperature-weighted A-ES sampling: python parity, proportionality,
temperature limits, and the DuckDB replay staged for r08."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark import oracles
from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.sampling import weighted_sample


def _key(doc_id, w, t=1.0):
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    u = (h + 1) / 2.0**60
    return round(math.log(-math.log(u)) - (1.0 / t) * math.log(w), 6)


def test_weighted_sample_matches_python_reference(spark):
    rows = [(i, float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, quality double")
    got = [
        (r["doc_id"], r["sample_rank"])
        for r in weighted_sample(df, 20, "quality", temperature=1.5)
        .orderBy("sample_rank")
        .collect()
    ]
    ranked = sorted(rows, key=lambda r: (_key(r[0], r[1], 1.5), r[0]))[:20]
    want = [(d, i + 1) for i, (d, _) in enumerate(ranked)]
    assert got == want


def test_weighted_sample_proportionality(spark):
    # weight-10 docs should win ~10x as often as weight-1 docs
    rows = [(i, 10.0 if i % 2 else 1.0) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = weighted_sample(df, 400, "w").collect()
    heavy = sum(1 for r in picked if r["doc_id"] % 2)
    # E[heavy] ≈ 400·10/11 ≈ 364; deterministic draw, wide band
    assert 320 <= heavy <= 395


def test_weighted_sample_temperature_limits(spark):
    rows = [(i, float(i + 1)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    # T -> 0: the (1/T)·ln w term dwarfs the Gumbel noise (spread ~7,
    # adjacent-weight gap 1000·ln(91/90) ≈ 11) -> exactly the top weights
    cold = {
        r["doc_id"] for r in weighted_sample(df, 10, "w", temperature=0.001).collect()
    }
    assert cold == set(range(90, 100))
    # high T flattens: the sample is no longer the top-weight prefix
    hot = {
        r["doc_id"] for r in weighted_sample(df, 10, "w", temperature=50.0).collect()
    }
    assert hot != set(range(90, 100))


def test_weighted_sample_excludes_nonpositive(spark):
    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(df, 10, "w").collect()}
    assert got == {1, 5}


def test_weighted_sample_stratified(spark):
    rows = [(i, "a" if i < 50 else "b", 1.0 + i % 3) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    out = weighted_sample(df, 5, "w", strata_col="source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["sample_rank"])
    assert sorted(by_src) == ["a", "b"]
    assert sorted(by_src["a"]) == [1, 2, 3, 4, 5]
    assert sorted(by_src["b"]) == [1, 2, 3, 4, 5]


def test_weighted_sample_duckdb_replay(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sdf = weighted_sample(docs, 25, "n_chars", temperature=2.0).select(
        "doc_id", "weight", "sample_key", "sample_rank"
    )
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    drows = sorted(
        tuple(r)
        for r in con.sql(
            oracles.weighted_sample_sql(25, "n_chars", temperature=2.0)
        ).fetchall()
    )
    assert srows == drows and len(srows) == 25


def test_weighted_sample_global_plan_no_full_window(spark):
    """Global top-n must be sort-and-limit (TakeOrdered), never a
    single-partition window over the corpus."""
    rows = [(i, 1.0 + i % 5) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    plan = (
        weighted_sample(df, 10, "w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "doc_id long, w double")
    with pytest.raises(ValueError):
        weighted_sample(df, 0, "w")
    with pytest.raises(ValueError):
        weighted_sample(df, 5, "w", temperature=0.0)
