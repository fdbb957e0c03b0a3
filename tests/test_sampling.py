"""Deterministic data-mixing samplers (operators.sampling)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordbindexing_spark.operators.sampling import (  # noqa: E402
    quota_sample,
    token_budget_sample,
)


def test_quota_caps_every_stratum(spark, tables):
    docs = tables["documents"]
    out = quota_sample(docs, strata_col="source", quota=7)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in per.items():
        assert n == min(7, sizes[s])
    assert max(r["sample_rank"] for r in out.collect()) <= 7


def test_quota_sample_is_stable_and_nested(spark, tables):
    # determinism: same draw twice; monotonicity: quota 5 ⊆ quota 9
    docs = tables["documents"]
    a = {(r["doc_id"]) for r in
         quota_sample(docs, "source", 5).select("doc_id").collect()}
    b = {(r["doc_id"]) for r in
         quota_sample(docs, "source", 5).select("doc_id").collect()}
    big = {(r["doc_id"]) for r in
           quota_sample(docs, "source", 9).select("doc_id").collect()}
    assert a == b
    assert a <= big


def test_token_budget_fill(spark, tables):
    docs = tables["documents"]
    out = token_budget_sample(docs, strata_col="source",
                              budget_tokens=300).collect()
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r["source"], []).append(r)
    for rows in by_stratum.values():
        rows.sort(key=lambda r: r["cum_tokens"])
        # inclusive cumsum is consistent
        run = 0
        for r in rows:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run
        # every kept row but possibly the first respects the budget
        assert all(r["cum_tokens"] <= 300 for r in rows[1:])


def test_token_budget_keeps_first_doc_even_if_over(spark):
    # a stratum whose sole document exceeds the budget is kept, not
    # silently dropped
    df = spark.createDataFrame(
        [(1, "s", " ".join(["w"] * 50)), (2, "t", "a b")],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in token_budget_sample(
        df, strata_col="source", budget_tokens=10
    ).collect()}
    assert out["s"]["n_tokens"] == 50 and out["s"]["cum_tokens"] == 50
    assert out["t"]["n_tokens"] == 2


def test_token_budget_null_text_matches_oracle(spark):
    # r07: the oracle must coalesce(text, '') like the operator does —
    # a NULL-text doc counts as 0 tokens on BOTH sides, keeping running
    # sums (and therefore the driver hash) aligned on NULL-bearing data.
    import duckdb

    from vectordbindexing_spark.oracles import token_budget_sample_sql

    rows = [
        (1, "s", "a b c"),
        (2, "s", None),
        (3, "s", "d e f g h"),
        (4, "t", None),
        (5, "t", "x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(
        tuple(r)
        for r in token_budget_sample(df, "source", budget_tokens=6)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .collect()
    )

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{s}', " + ("NULL" if t is None else f"'{t}'") + ")"
            for i, s, t in rows
        )
        + ") AS v(doc_id, source, text)"
    )
    want = sorted(tuple(r) for r in con.sql(
        token_budget_sample_sql(budget_tokens=6)
    ).fetchall())
    assert got == want
    assert any(r[2] == 0 for r in got)  # the NULL rows really hit the path
