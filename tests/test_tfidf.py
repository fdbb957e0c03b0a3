"""TF-IDF top-terms: hand pins, python parity, and the real-documents
DuckDB replay staged for r08."""

from __future__ import annotations

import math

import duckdb
import pytest

from vectordbindexing_spark import oracles
from vectordbindexing_spark.operators.retrieval import tfidf_top_terms

DOCS = [
    (0, "apple apple banana common"),
    (1, "banana cherry common"),
    (2, "cherry cherry cherry common"),
    (3, None),
]


def _py_tfidf(docs, k):
    toks = {d: (t or "").lower().split() for d, t in docs}
    n = len(docs)
    df = {}
    for tk in toks.values():
        for t in set(tk):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d, tk in toks.items():
        if not tk:
            continue
        scored = sorted(
            (
                (-round(tk.count(t) * math.log(1 + n / df[t]), 6), t)
                for t in set(tk)
            )
        )
        for r, (ns, t) in enumerate(scored[:k], 1):
            out[(d, r)] = (t, -ns)
    return out


def test_tfidf_hand_pins(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"])
           for r in tfidf_top_terms(df, k=2).collect()}
    # doc 0: apple (tf2, df1) clearly beats banana (tf1, df2) and
    # common (tf1, df3)
    assert got[(0, 1)] == ("apple", 2, 1)
    assert got[(0, 2)] == ("banana", 1, 2)
    # doc 2: cherry tf3 dominates
    assert got[(2, 1)] == ("cherry", 3, 2)
    # null-text doc produces no rows
    assert not any(d == 3 for d, _ in got)


def test_tfidf_python_parity(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r["doc_id"], r["rank"]): (r["term"], r["score"])
           for r in tfidf_top_terms(df, k=3).collect()}
    want = _py_tfidf(DOCS, 3)
    assert got.keys() == want.keys()
    for key in want:
        assert got[key][0] == want[key][0], key
        assert got[key][1] == pytest.approx(want[key][1], abs=2e-6)


def test_tfidf_duckdb_replay_real_documents(spark, sf_dir):
    """The exact comparison the r08 contract query will run."""
    import __spark_entry__ as e

    srows = sorted(tuple(r) for r in e._text_tfidf_terms(spark, sf_dir).collect())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    drows = sorted(
        tuple(r) for r in con.sql(oracles.tfidf_top_terms_sql(k=5)).fetchall()
    )
    assert srows == drows
    assert len(srows) >= 500 * 4  # most docs have >= 5 distinct terms
