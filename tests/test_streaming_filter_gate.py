"""Streaming corpus gate: single-batch parity with the batch gate and
cross-batch first-arrival dedup.

The stateful query runs micro-batches continuously (processing-time
timeouts schedule empty batches), so tests poll the memory sink for the
expected row count instead of processAllAvailable (same pattern as
test_stateful_sessionize). Every input row emits immediately — the
timeout only evicts dedup state — so the expected count is exact.
"""

import time
import uuid

from pyspark.sql import functions as F

from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.textops import corpus_filter_gate
from vectordbindexing_spark.streaming.filter_gate import corpus_gate_stream


def _run_stream(spark, batches, tmp_path, expect_rows):
    """Feed each batch DataFrame as one file drop; poll the memory sink
    until expect_rows arrive (or time out). Returns collected rows."""
    import os

    feed = str(tmp_path / "feed")
    os.makedirs(feed, exist_ok=True)
    name = "gate_sink_" + uuid.uuid4().hex[:8]
    stream = spark.readStream.schema("doc_id long, text string").parquet(feed)
    q = (
        corpus_gate_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        for b in batches:
            before = spark.sql(f"select count(*) from {name}").collect()[0][0]
            b.coalesce(1).write.mode("append").parquet(feed)
            target = before + b.count()
            for _ in range(120):
                n = spark.sql(
                    f"select count(*) from {name}"
                ).collect()[0][0]
                if n >= target:
                    break
                time.sleep(1)
        rows = spark.sql(f"select * from {name}").collect()
    finally:
        q.stop()
    assert len(rows) == expect_rows, f"emitted {len(rows)} != {expect_rows}"
    return rows


def test_single_batch_matches_batch_gate(spark, sf_dir, tmp_path):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text").limit(200).localCheckpoint(eager=True)
    )
    got = _run_stream(spark, [docs], tmp_path, docs.count())
    want = corpus_filter_gate(docs).collect()
    key = lambda r: r["doc_id"]
    assert [tuple(r) for r in sorted(got, key=key)] == [
        tuple(r) for r in sorted(want, key=key)
    ]


def test_cross_batch_duplicate_drops(spark, tmp_path):
    d1 = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog of it all"),
         (2, "a completely different text to keep for training and more")],
        schema="doc_id long, text string",
    )
    # batch 2 re-sends doc 1's text under a NEW id + one fresh doc
    d2 = spark.createDataFrame(
        [(7, "the quick brown fox and the lazy dog of it all"),
         (8, "yet another unique document body for the corpus and tests")],
        schema="doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in _run_stream(spark, [d1, d2], tmp_path, 4)
    }
    assert rows[1]["is_keeper"] == 1 and rows[1]["reason"] == "keep"
    assert rows[7]["is_keeper"] == 0 and rows[7]["reason"] == "duplicate"
    assert rows[2]["is_keeper"] == 1
    assert rows[8]["is_keeper"] == 1
