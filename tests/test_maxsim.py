"""MaxSim late-interaction retrieval: hand pins, python parity, the
candidate-shortlist path, and the real-embeddings DuckDB replay staged
for the r08 contract query."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark import oracles
from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.retrieval import maxsim_topk

DOC_TOKENS = [
    (0, [1.0, 0.0]), (0, [0.0, 1.0]),
    (1, [1.0, 1.0]), (1, [-1.0, 0.0]),
    (2, [0.5, 0.5]),
]
Q_TOKENS = [
    (7, 0, [1.0, 0.0]),
    (7, 1, [0.0, 2.0]),
    (8, 0, [-1.0, -1.0]),
]


def _py_maxsim(doc_tokens, q_tokens, k=10):
    docs = {}
    for d, v in doc_tokens:
        docs.setdefault(d, []).append(v)
    qs = {}
    for q, p, v in q_tokens:
        qs.setdefault(q, []).append((p, v))
    out = {}
    for q, toks in qs.items():
        scored = []
        for d, dvs in docs.items():
            s = 0.0
            for _, qv in sorted(toks):
                s += max(sum(a * b for a, b in zip(qv, dv)) for dv in dvs)
            scored.append((round(s, 6), d))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for r, (s, d) in enumerate(scored[:k], 1):
            out[(q, r)] = (d, s)
    return out


def _dfs(spark):
    dt = spark.createDataFrame(DOC_TOKENS, "doc_id long, vec array<double>")
    qt = spark.createDataFrame(
        Q_TOKENS, "query_id long, qpos long, vec array<double>"
    )
    return dt, qt


def test_maxsim_hand_pins(spark):
    dt, qt = _dfs(spark)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in maxsim_topk(dt, qt).collect()
    }
    # q7: doc0 = max(1,0)+max(0,2) = 3.0; doc1 = max(1,-1)+max(2,0) = 3.0
    # (tie -> doc0 first); doc2 = 0.5 + 1.0 = 1.5
    assert got[(7, 1)] == (0, 3.0)
    assert got[(7, 2)] == (1, 3.0)
    assert got[(7, 3)] == (2, 1.5)
    # q8: doc1's (-1,0) token gives +1 ... max(-2, 1) = 1
    assert got[(8, 1)] == (1, 1.0)


def test_maxsim_python_parity(spark):
    dt, qt = _dfs(spark)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in maxsim_topk(dt, qt, k=3).collect()
    }
    want = _py_maxsim(DOC_TOKENS, Q_TOKENS, k=3)
    assert got.keys() == want.keys()
    for key in want:
        assert got[key][0] == want[key][0], key
        assert got[key][1] == pytest.approx(want[key][1], abs=1e-6), key


def test_maxsim_candidates_restrict(spark):
    dt, qt = _dfs(spark)
    cand = spark.createDataFrame(
        [(7, 1), (7, 2), (8, 0)], "query_id long, doc_id long"
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in maxsim_topk(dt, qt, candidates=cand).collect()
    }
    # only the shortlisted pairs are scored; scores match the full run
    assert set(got) == {(7, 1), (7, 2), (8, 0)}
    assert got[(7, 1)] == (1, 3.0)
    assert got[(7, 2)] == (2, 1.5)
    assert got[(8, 0)][1] == pytest.approx(-1.0, abs=1e-6)


def _contract_frames(spark, sf_dir, n_queries=4, n_qtokens=4, n_docs=250):
    emb = load_table(spark, sf_dir, "embeddings")
    dt = emb.select(
        (F.col("vec_id") % n_docs).alias("doc_id"),
        F.col("embedding").alias("vec"),
    )
    qt = emb.where(F.col("vec_id") < n_queries * n_qtokens).select(
        (F.col("vec_id") % n_queries).alias("query_id"),
        F.expr(f"vec_id div {n_queries}").alias("qpos"),
        F.col("embedding").alias("vec"),
    )
    return dt, qt


def test_maxsim_duckdb_replay_real_embeddings(spark, sf_dir):
    """The exact comparison the r08 contract query will run."""
    dt, qt = _contract_frames(spark, sf_dir)
    srows = sorted(
        tuple(r) for r in maxsim_topk(dt, qt, k=10).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    drows = sorted(tuple(r) for r in con.sql(oracles.maxsim_topk_sql()).fetchall())
    assert srows == drows
    assert len(srows) == 4 * 10


def test_maxsim_candidates_match_full_run(spark, sf_dir):
    """Restricting to an everything-shortlist reproduces the full
    ranking — the retrieve-then-rerank path is score-identical."""
    dt, qt = _contract_frames(spark, sf_dir)
    full = maxsim_topk(dt, qt, k=5)
    all_cand = dt.select("doc_id").distinct().crossJoin(
        qt.select("query_id").distinct()
    )
    shortlisted = maxsim_topk(dt, qt, k=5, candidates=all_cand)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, shortlisted.collect())
    )
