"""NB quality classifier — numpy parity, separation, edge cases."""

from __future__ import annotations

import math

import pytest

from vectordbindexing_spark.operators.classify import (
    nb_train_score,
    quality_classifier_scores,
)

ROWS = [
    (1, "good clean prose with many words here now"),   # 8 toks
    (2, "good clean text with words"),                   # 5 toks
    (3, "spam spam spam"),                               # 3 toks
    (4, "spam junk"),                                    # 2 toks
    (5, None),                                           # no tokens
]
# labels: long-ish docs (>= 5 tokens) are the positive seeds
LABELS = {1: 1, 2: 1, 3: 0, 4: 0, 5: 0}


def _np_nb(rows, labels, k=0.5):
    occ = []
    for did, text in rows:
        toks = [t for t in (text or "").split(" ") if t]
        occ.append((did, labels[did], toks))
    wc = {}
    for _, lab, toks in occ:
        for w in toks:
            c = wc.setdefault(w, [0, 0])
            c[lab] += 1
    t1 = sum(c[1] for c in wc.values())
    t0 = sum(c[0] for c in wc.values())
    v = len(wc)
    d1 = sum(1 for l in labels.values() if l == 1)
    d0 = len(labels) - d1
    out = {}
    for did, _, toks in occ:
        s = 0.0
        for w in toks:
            c0, c1 = wc[w][0], wc[w][1]
            s += math.log((c1 + k) / (t1 + k * v)) - math.log(
                (c0 + k) / (t0 + k * v)
            )
        lo = round(s + math.log((d1 + k) / (d0 + k)), 6)
        out[did] = (len(toks), lo, 1 if lo >= 0 else 0)
    return out


def test_nb_matches_numpy_reference(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    labels = spark.createDataFrame(
        [(d, l) for d, l in LABELS.items()], "doc_id long, label long"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_odds"], r["pred"])
        for r in nb_train_score(df, labels).collect()
    }
    exp = _np_nb(ROWS, LABELS)
    for did in exp:
        assert got[did][0] == exp[did][0]
        assert got[did][1] == pytest.approx(exp[did][1], abs=2e-6)
        assert got[did][2] == exp[did][2]


def test_nb_separates_seed_classes(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    labels = spark.createDataFrame(
        [(d, l) for d, l in LABELS.items()], "doc_id long, label long"
    )
    got = {r["doc_id"]: r["log_odds"] for r in nb_train_score(df, labels).collect()}
    # positive-seeded docs score above every negative-seeded doc
    assert min(got[1], got[2]) > max(got[3], got[4])


def test_empty_doc_scores_prior_only(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    labels = spark.createDataFrame(
        [(d, l) for d, l in LABELS.items()], "doc_id long, label long"
    )
    r = {r["doc_id"]: r for r in nb_train_score(df, labels).collect()}[5]
    assert r["n_tokens"] == 0
    # prior = ln((2+0.5)/(3+0.5))
    assert r["log_odds"] == pytest.approx(
        round(math.log(2.5 / 3.5), 6), abs=2e-6
    )


def test_quality_classifier_end_to_end(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = quality_classifier_scores(df, min_tokens=5)
    got = {r["doc_id"]: r["pred"] for r in out.collect()}
    assert got[1] == 1 and got[3] == 0
    types = [f.dataType.simpleString() for f in out.schema.fields]
    assert types == ["bigint", "bigint", "double", "bigint"]
