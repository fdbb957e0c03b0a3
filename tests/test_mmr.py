"""MMR diversity re-rank: hand pins, independent-python parity, DuckDB
replays (VALUES + the exact-kNN shortlist over real embeddings staged
for the r08 contract query)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark import oracles
from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.mmr import mmr_rerank

# two tight clusters + one outlier; rel prefers the clusters
CANDS = [
    # query 1
    (1, 10, 0.95, [1.0, 0.0, 0.0]),
    (1, 11, 0.94, [0.99, 0.1, 0.0]),   # near-dup of 10
    (1, 12, 0.50, [0.0, 1.0, 0.0]),    # orthogonal
    (1, 13, 0.49, [0.0, 0.99, 0.1]),   # near-dup of 12
    (1, 14, 0.10, [0.0, 0.0, 1.0]),    # far outlier
    # query 2: single candidate
    (2, 20, 0.8, [1.0, 1.0, 0.0]),
]


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / (math.sqrt(sum(x * x for x in a))
                  * math.sqrt(sum(x * x for x in b)))


def _py_mmr(cands, k, lam):
    out = {}
    for q in sorted({c[0] for c in cands}):
        pool = sorted([c for c in cands if c[0] == q], key=lambda c: c[1])
        sel = []
        for rank in range(1, min(k, len(pool)) + 1):
            best, best_s = None, None
            for c in pool:
                if any(s[1] == c[1] for s in sel):
                    continue
                if rank == 1:
                    s = c[2]
                else:
                    ms = max(_cos(c[3], s[3]) for s in sel)
                    s = lam * c[2] - (1 - lam) * ms
                if best_s is None or s > best_s:
                    best, best_s = c, s
            sel.append(best)
            out[(q, rank)] = (best[1], round(best_s, 6))
    return out


def _df(spark):
    return spark.createDataFrame(
        CANDS, "query_id long, doc_id long, rel double, vec array<double>"
    )


def test_mmr_prefers_diversity(spark):
    got = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in mmr_rerank(_df(spark), k=3, lam=0.5).collect()
    }
    # rank1 = best rel (10); rank2 must skip the near-dup 11 and take
    # the orthogonal 12; rank3 = the outlier 14 (13 is a dup of 12)
    assert got[(1, 1)] == 10
    assert got[(1, 2)] == 12
    assert got[(1, 3)] == 14
    assert got[(2, 1)] == 20


def test_mmr_python_parity(spark):
    for lam in (0.3, 0.7):
        got = {
            (r["query_id"], r["rank"]): (r["doc_id"], r["mmr_score"])
            for r in mmr_rerank(_df(spark), k=4, lam=lam).collect()
        }
        want = _py_mmr(CANDS, k=4, lam=lam)
        assert got.keys() == want.keys()
        for key in want:
            assert got[key][0] == want[key][0], (lam, key)
            assert got[key][1] == pytest.approx(want[key][1], abs=2e-6)


def test_mmr_lambda_one_is_pure_relevance(spark):
    got = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in mmr_rerank(_df(spark), k=5, lam=1.0).collect()
    }
    # lam=1 ignores similarity: pure rel order
    assert [got[(1, r)] for r in range(1, 6)] == [10, 11, 12, 13, 14]


def test_mmr_validation(spark):
    with pytest.raises(ValueError):
        mmr_rerank(_df(spark), k=0)


def test_mmr_duckdb_replay_values(spark):
    srows = sorted(
        tuple(r) for r in mmr_rerank(_df(spark), k=3, lam=0.7).collect()
    )
    vals = ", ".join(
        f"({q}, {d}, {r}::DOUBLE, {v}::DOUBLE[])" for q, d, r, v in CANDS
    )
    sql = oracles.mmr_rerank_sql(
        f"SELECT * FROM (VALUES {vals}) t(query_id, doc_id, rel, v)",
        k=3, lam=0.7,
    )
    con = duckdb.connect()
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows and len(srows) == 4


def _shortlist_cand_sql(k_fetch=20):
    return (
        f"SELECT t.qid AS query_id, t.neighbor_id AS doc_id, "
        f"1.0::DOUBLE - t.dist AS rel, e.embedding::DOUBLE[] AS v "
        f"FROM ({oracles.knn_exact_sql('cosine', k=k_fetch)}) t "
        f"JOIN embeddings e ON e.vec_id = t.neighbor_id"
    )


def test_mmr_duckdb_replay_knn_shortlist(spark, sf_dir):
    """The exact comparison the r08 contract query will run: MMR over
    the exact-kNN top-20 shortlist of the standard query split."""
    from vectordbindexing_spark.operators.exact_knn import exact_knn

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 10 == 0)
    b = emb.where(F.col("vec_id") % 10 != 0)
    knn = exact_knn(
        q, b, k=20, metric="cosine",
        q_id="vec_id", q_vec="embedding", b_id="vec_id", b_vec="embedding",
    )
    cand = knn.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    ).select(
        F.col("qid").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        (F.lit(1.0) - F.round(F.col("dist"), 6)).alias("rel"),
        F.col("embedding").alias("vec"),
    )
    srows = sorted(
        tuple(r) for r in mmr_rerank(cand, k=5, lam=0.7).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    sql = oracles.mmr_rerank_sql(_shortlist_cand_sql(), k=5, lam=0.7)
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows
    assert len(srows) == 5 * 50  # 50 queries (vec_id % 10 == 0 of 500)
