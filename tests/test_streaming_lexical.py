"""Streamed lexical-stats artifact == batch lexical_stats; exactly-once
ledger; BM25 served from the maintained artifact == direct BM25."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordbindexing_spark.operators.retrieval import (
    TERM_CORPUS,
    bm25_topk,
    lexical_stats,
)
from vectordbindexing_spark.streaming.lexical import (
    load_lexical_stats,
    merge_lexical_batch,
    run_lexical_ingest,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick fox"),
    (2, "lorem ipsum dolor sit amet"),
    (3, "quick quick quick brown"),
    (4, "a dog and a dog and a dog"),
    (5, None),
]


def _stats(df):
    return {r["term"]: (r["df"], r["tf"]) for r in df.collect()}


def _docs_df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batch_stats_shape(spark):
    got = _stats(lexical_stats(_docs_df(spark)))
    assert got[TERM_CORPUS] == (6, 29)  # 6 docs (one NULL), 29 tokens
    assert got["quick"] == (3, 5)
    assert got["dog"] == (2, 4)


def test_streamed_artifact_matches_batch(spark, tmp_path):
    docs = _docs_df(spark)
    src = str(tmp_path / "feed")
    docs.where(F.col("doc_id") < 3).write.parquet(src + "/a")
    docs.where(F.col("doc_id") >= 3).write.parquet(src + "/b")
    art = str(tmp_path / "lex")
    stream = spark.readStream.schema(docs.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    q = run_lexical_ingest(stream, art, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = _stats(load_lexical_stats(spark, art))
    want = _stats(lexical_stats(docs))
    assert got == want


def test_replay_is_noop_via_ledger(spark, tmp_path):
    docs = _docs_df(spark)
    art = str(tmp_path / "lex")
    assert merge_lexical_batch(docs, 0, art)
    once = _stats(load_lexical_stats(spark, art))
    assert merge_lexical_batch(docs, 0, art) is False  # crash replay
    assert _stats(load_lexical_stats(spark, art)) == once
    # stats ADD: a fresh batch id doubles everything (the bug the
    # ledger prevents on replay)
    assert merge_lexical_batch(docs, 1, art)
    assert _stats(load_lexical_stats(spark, art)) == {
        t: (2 * d, 2 * tf) for t, (d, tf) in once.items()
    }


def test_bm25_from_maintained_stats_matches_direct(spark, tmp_path):
    """The serving hook: scoring the full corpus against the streamed
    stats artifact reproduces direct BM25 exactly (same df/N/Σdl by
    the equality above, same tf from the scoring docs)."""
    docs = _docs_df(spark)
    art = str(tmp_path / "lex")
    merge_lexical_batch(docs.where(F.col("doc_id") % 2 == 0), 0, art)
    merge_lexical_batch(docs.where(F.col("doc_id") % 2 == 1), 1, art)
    stats = load_lexical_stats(spark, art)
    queries = [(1, "quick fox"), (2, "dog lorem")]
    direct = sorted(
        tuple(r) for r in bm25_topk(docs, queries, k=10).collect()
    )
    served = sorted(
        tuple(r)
        for r in bm25_topk(docs, queries, k=10, stats=stats).collect()
    )
    assert direct == served and len(direct) > 0


def test_bm25_stats_scores_new_batch(spark):
    """Incremental serving: score a NEW batch of docs against corpus
    stats that do NOT include them — the per-query-wave shape (stats
    stay authoritative, unseen-by-stats terms are skipped)."""
    corpus = _docs_df(spark)
    stats = lexical_stats(corpus)
    new = spark.createDataFrame(
        [(100, "quick unseen dog")], "doc_id long, text string"
    )
    rows = bm25_topk(new, [(1, "quick unseen dog")], k=5,
                     stats=stats).collect()
    assert len(rows) == 1
    # 'unseen' is not in the stats vocabulary -> only 2 terms scored
    assert rows[0]["n_terms"] == 2
