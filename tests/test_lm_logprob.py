"""Char-trigram LM scoring: python-reference parity on a tiny corpus,
signal direction (gibberish scores worse than in-distribution text),
short-doc handling, and determinism of the ordered log fold."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.textops import char_trigram_logprob


def _py_reference(texts: dict[int, str], k=0.5):
    occ = []
    for did, t in texts.items():
        for i in range(len(t) - 2):
            occ.append((did, t[i : i + 3], t[i : i + 2]))
    tric: dict[str, int] = {}
    bic: dict[str, int] = {}
    for _, tri, bi in occ:
        tric[tri] = tric.get(tri, 0) + 1
        bic[bi] = bic.get(bi, 0) + 1
    v = len(tric)
    out = {}
    for did, t in texts.items():
        logs = [
            math.log((tric[t[i : i + 3]] + k) / (bic[t[i : i + 2]] + k * v))
            for i in range(len(t) - 2)
        ]
        if logs:
            out[did] = (len(logs), round(-sum(logs) / len(logs), 6))
    return out


def test_matches_python_reference(spark):
    texts = {
        0: "the cat sat on the mat",
        1: "the dog sat on the log",
        2: "aaaaaaaaaa",
        3: "xy",  # too short: no trigrams → no output row
        4: "",
    }
    df = spark.createDataFrame(
        list(texts.items()), schema="doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_neg_logp"])
        for r in char_trigram_logprob(df).collect()
    }
    want = _py_reference(texts)
    assert set(got) == set(want) == {0, 1, 2}
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-6)


def test_gibberish_scores_worse_than_corpus_text(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    normal = [
        (i, "the quick brown fox jumps over the lazy dog " * 3)
        for i in range(20)
    ]
    letters = "abcdefghijklmnopqrstuvwxyz "
    gib = [
        (
            100 + i,
            "".join(rng.choice(list(letters), size=120)),
        )
        for i in range(3)
    ]
    df = spark.createDataFrame(
        normal + gib, schema="doc_id long, text string"
    )
    rows = {r["doc_id"]: r["avg_neg_logp"]
            for r in char_trigram_logprob(df).collect()}
    worst_normal = max(v for k, v in rows.items() if k < 100)
    best_gib = min(v for k, v in rows.items() if k >= 100)
    assert best_gib > worst_normal  # perplexity separates the two


def test_arrow_and_join_impls_agree(spark):
    """The broadcast-dict arrow path and the distributed join path fold
    the same logs in the same order — outputs agree to the 1e-6 output
    rounding (the only residual is libm-vs-JVM log ulp)."""
    texts = {
        0: "the cat sat on the mat and the cat sat again",
        1: "completely different content here with words",
        2: "zz",
        3: "aaa",
    }
    df = spark.createDataFrame(
        list(texts.items()), schema="doc_id long, text string"
    )
    a = {
        r["doc_id"]: (r["n_trigrams"], r["avg_neg_logp"])
        for r in char_trigram_logprob(df, impl="arrow").collect()
    }
    j = {
        r["doc_id"]: (r["n_trigrams"], r["avg_neg_logp"])
        for r in char_trigram_logprob(df, impl="join").collect()
    }
    assert set(a) == set(j) == {0, 1, 3}
    for did in a:
        assert a[did][0] == j[did][0]
        assert a[did][1] == pytest.approx(j[did][1], abs=2e-6)


def test_null_text_and_determinism(spark):
    rows = [(0, None), (1, "hello world"), (2, "hello world")]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    a = sorted(map(tuple, char_trigram_logprob(df).collect()))
    b = sorted(map(tuple, char_trigram_logprob(df).collect()))
    assert a == b
    assert [r[0] for r in a] == [1, 2]
    assert a[1][1] == a[2- 1][1]  # identical docs score identically
