"""Streaming MinHash near-dup gate: single-batch parity with a
shared-kernel python reference, cross-batch residency, state caps.

Poll-the-memory-sink pattern from test_streaming_filter_gate; expected
counts come from the reference (the gate emits only match rows).
"""

from __future__ import annotations

import time
import uuid

import pytest

N, NUM_HASHES, BANDS, THRESHOLD = 3, 16, 8, 0.5


def _py_grams(text: str) -> list[str]:
    toks = [t for t in (text or "").split(" ") if t]
    if len(toks) >= N:
        return [" ".join(toks[i : i + N]) for i in range(len(toks) - N + 1)]
    return [" ".join(toks)]


def _py_sig(text: str) -> list[int]:
    import numpy as np

    from vectordbindexing_spark.functions.hashing import (
        det_hash64_py,
        minhash_signature_np,
    )

    hs = np.array([det_hash64_py(g) for g in _py_grams(text)], dtype=np.int64)
    return minhash_signature_np(hs, NUM_HASHES).tolist()


def _py_matches(rows: list[tuple[int, str]]) -> set[tuple[int, int, int]]:
    """Expected (doc_id, dup_of, band_idx) rows for arrival order ==
    ascending doc_id (the single-batch ordering contract)."""
    from vectordbindexing_spark.streaming.neardup_gate import _band_keys

    rpb = NUM_HASHES // BANDS
    sigs = {did: _py_sig(t) for did, t in rows}
    buckets: dict[tuple[int, str], list[int]] = {}
    out = set()
    for did, _ in sorted(rows):
        sig = sigs[did]
        for b, key in enumerate(_band_keys(sig, BANDS, rpb)):
            res = buckets.setdefault((b, key), [])
            for rid in res:
                est = sum(
                    a == b2 for a, b2 in zip(sig, sigs[rid])
                ) / NUM_HASHES
                if est >= THRESHOLD:
                    out.add((did, rid, b))
            res.append(did)
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3, "completely different text about spark distributed dataflow engines"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),
    (5, "another unrelated document mentioning parquet columnar storage"),
]


def _run(spark, tmp_path, batches, expect_rows):
    import os

    from vectordbindexing_spark.streaming.neardup_gate import (
        neardup_match_stream,
    )

    feed = str(tmp_path / "feed")
    os.makedirs(feed, exist_ok=True)
    name = "nd_sink_" + uuid.uuid4().hex[:8]
    stream = spark.readStream.schema("doc_id long, text string").parquet(feed)
    q = (
        neardup_match_stream(
            stream, n=N, num_hashes=NUM_HASHES, bands=BANDS,
            threshold=THRESHOLD,
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        for b, n_expected_after in batches:
            spark.createDataFrame(b, "doc_id long, text string").coalesce(
                1
            ).write.mode("append").parquet(feed)
            for _ in range(120):
                n = spark.sql(f"select count(*) from {name}").collect()[0][0]
                if n >= n_expected_after:
                    break
                time.sleep(1)
        rows = spark.sql(f"select * from {name}").collect()
    finally:
        q.stop()
    assert len(rows) == expect_rows, f"emitted {len(rows)} != {expect_rows}"
    return rows


def test_single_batch_matches_reference(spark, tmp_path):
    exp = _py_matches(DOCS)
    assert exp, "fixture must contain near-dups"
    # exact copy (1,4) must match in every band; near-copy (1,2)/(2,4)
    # in at least one
    assert any(a == 4 and b == 1 for a, b, _ in exp)
    rows = _run(spark, tmp_path, [(DOCS, len(exp))], len(exp))
    got = {(r["doc_id"], r["dup_of"], r["band_idx"]) for r in rows}
    assert got == exp
    for r in rows:
        assert 0.5 <= r["est_jaccard"] <= 1.0


def test_cross_batch_earlier_arrival_is_resident(spark, tmp_path):
    batch1 = [DOCS[0], DOCS[2]]             # originals
    batch2 = [DOCS[3], DOCS[4]]             # 4 is an exact copy of 1
    exp1 = _py_matches(batch1)
    assert exp1 == set()
    exp_all = {
        (did, rid, b)
        for (did, rid, b) in _py_matches(batch1 + batch2)
    }
    rows = _run(
        spark, tmp_path,
        [(batch1, 0), (batch2, len(exp_all))],
        len(exp_all),
    )
    got = {(r["doc_id"], r["dup_of"], r["band_idx"]) for r in rows}
    assert got == exp_all
    assert all(r["doc_id"] == 4 and r["dup_of"] == 1 for r in rows)
