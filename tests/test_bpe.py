"""BPE train/encode — hand-computed merges, determinism, Spark parity."""

from __future__ import annotations

import pytest

from vectordbindexing_spark.operators.bpe import (
    END,
    bpe_encode_stats,
    bpe_encode_word,
    bpe_merge_loop,
    bpe_train,
    corpus_word_counts,
)


def test_merge_loop_hand_case():
    # "ab" x3: pairs (a,b)=3 and (b,</w>)=3 tie -> lexicographically
    # smallest ('a','b') wins rank 0; then (ab,</w>)=3 is rank 1; the
    # word is a single symbol after that -> loop ends early.
    assert bpe_merge_loop([("ab", 3)], num_merges=10) == [
        (0, "a", "b", 3),
        (1, "ab", END, 3),
    ]


def test_merge_loop_freq_priority():
    # "cd" x5 beats "ab" x3 every round until both collapse.
    merges = bpe_merge_loop([("cd", 5), ("ab", 3)], num_merges=10)
    assert merges == [
        (0, "c", "d", 5),
        (1, "cd", END, 5),
        (2, "a", "b", 3),
        (3, "ab", END, 3),
    ]


def test_merge_loop_min_freq_stop():
    # singleton pairs (freq 1) never merge
    assert bpe_merge_loop([("xy", 1)], num_merges=10) == []


def test_encode_word_applies_lowest_rank_first():
    ranks = {("a", "b"): 0, ("ab", END): 1}
    assert bpe_encode_word("ab", ranks) == ["ab" + END]
    assert bpe_encode_word("abx", ranks) == ["ab", "x", END]
    assert bpe_encode_word("zz", ranks) == ["z", "z", END]


def test_word_counts_canonical_order(spark):
    df = spark.createDataFrame(
        [(1, "b b a a c"), (2, None), (3, "c  c")], "doc_id long, text string"
    )
    got = [(r["word"], r["cnt"]) for r in corpus_word_counts(df).collect()]
    # cnt desc, word asc: c=3, a=2, b=2 -> c, a, b
    assert got == [("c", 3), ("a", 2), ("b", 2)]


def test_train_and_encode_stats_match_pure_python(spark):
    rows = [(1, "ab ab cd"), (2, "ab x"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges_df = bpe_train(df, min_count=2, num_merges=10)
    merges = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["freq"])
        for r in merges_df.collect()
    ]
    # words: ab=3, cd=1, x=1 -> only "ab" survives min_count=2
    assert merges == [(0, "a", "b", 3), (1, "ab", END, 3)]

    from vectordbindexing_spark.functions.hashing import det_hash60_py

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["tok_hash"])
        for r in bpe_encode_stats(df, merges_df).collect()
    }
    ranks = {(l, r): k for k, l, r, _ in merges}
    exp = {}
    for did, text in rows:
        toks = [t for t in (text or "").split(" ") if t]
        enc = [s for w in toks for s in bpe_encode_word(w, ranks)]
        exp[did] = (len(toks), len(enc), det_hash60_py(" ".join(enc)))
    assert got == exp


def test_oracle_pins_match_spark_on_testdata(spark):
    """bpe_train over the real sf0.001 corpus reproduces the oracle
    generator's pinned merges (shared-fit contract)."""
    import duckdb

    from vectordbindexing_spark import oracles
    from vectordbindexing_spark.io.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["freq"])
        for r in bpe_train(
            docs, top_v=10_000, min_count=2, num_merges=150
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        oracles.bpe_train_merges_sql(top_v=10_000, min_count=2, num_merges=150)
    ).fetchall()
    assert got == [tuple(r) for r in exp]
    assert len(got) > 0
