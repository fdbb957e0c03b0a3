"""Streamed CMS counter artifact == batch sketch; replay exactly-once
via the in-artifact batch-id ledger."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordbindexing_spark.operators.sketch import cms_counters, cms_estimate
from vectordbindexing_spark.streaming.cms import (
    merge_cms_batch,
    run_cms_ingest,
    split_artifact,
)


def _counters(df):
    return {
        (r["sketch_row"], r["bucket"]): r["cnt"]
        for r in df.collect()
        if r["sketch_row"] != -1
    }


def test_streamed_artifact_matches_batch(spark, tmp_path):
    data = spark.range(3000).select(
        F.concat(F.lit("tok"), (F.col("id") % 50).cast("string")).alias("tok")
    )
    src = str(tmp_path / "feed")
    data.filter(F.col("tok") != "tok7").write.parquet(src + "/a")
    data.filter(F.col("tok") == "tok7").write.parquet(src + "/b")
    art = str(tmp_path / "cms")
    stream = spark.readStream.schema(data.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    q = run_cms_ingest(stream, art, str(tmp_path / "ckpt"), col="tok",
                       depth=3, width=64)
    q.awaitTermination(120)
    got = _counters(spark.read.parquet(art))
    want = _counters(cms_counters(data, "tok", depth=3, width=64))
    assert got == want


def test_replay_is_noop_via_ledger(spark, tmp_path):
    data = spark.range(400).select(
        (F.col("id") % 9).cast("string").alias("tok")
    )
    art = str(tmp_path / "cms")
    assert merge_cms_batch(data, 0, art, "tok", depth=3, width=32)
    once = _counters(spark.read.parquet(art))
    # crash between artifact write and checkpoint commit -> same batch id
    assert merge_cms_batch(data, 0, art, "tok", depth=3, width=32) is False
    assert _counters(spark.read.parquet(art)) == once
    # counters ADD, so without the ledger this replay would double-count
    assert merge_cms_batch(data, 1, art, "tok", depth=3, width=32)
    doubled = _counters(spark.read.parquet(art))
    assert doubled == {k: 2 * v for k, v in once.items()}


def test_incremental_merge_accumulates(spark, tmp_path):
    a = spark.range(0, 300).select((F.col("id") % 7).cast("string").alias("tok"))
    b = spark.range(300, 900).select((F.col("id") % 7).cast("string").alias("tok"))
    art = str(tmp_path / "cms")
    merge_cms_batch(a, 0, art, "tok", depth=3, width=32)
    merge_cms_batch(b, 1, art, "tok", depth=3, width=32)
    got = _counters(spark.read.parquet(art))
    both = a.unionByName(b)
    assert got == _counters(cms_counters(both, "tok", depth=3, width=32))
    # and the ledger carries exactly the two merged batch ids
    _, ledger = split_artifact(spark.read.parquet(art))
    assert {r["bucket"] for r in ledger.collect()} == {0, 1}


def test_estimates_from_streamed_artifact(spark, tmp_path):
    data = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, "hot").otherwise(
            F.concat(F.lit("t"), F.col("id").cast("string"))
        ).alias("tok")
    )
    art = str(tmp_path / "cms")
    merge_cms_batch(data, 0, art, "tok", depth=4, width=256)
    counters, _ = split_artifact(spark.read.parquet(art))
    items = data.sparkSession.createDataFrame(
        [("hot",), ("t1",)], "tok string"
    )
    rows = cms_estimate(counters, items, "tok", depth=4, width=256).collect()
    est = {r["tok"]: r["est_count"] for r in rows}
    assert est["hot"] >= 100  # never undercounts
    assert est["t1"] >= 1


def test_crash_mid_write_preserves_artifact(spark, tmp_path, monkeypatch):
    """A crash during the (long) temp-dir parquet write must leave the
    previous counters + ledger fully intact — in-place overwrite would
    have deleted them first and lost all accumulated state."""
    import vectordbindexing_spark.streaming.atomic as atomic

    art = str(tmp_path / "cms_art")
    b1 = spark.range(100).select(
        F.concat(F.lit("t"), (F.col("id") % 10).cast("string")).alias("tok")
    )
    assert merge_cms_batch(b1, 0, art, "tok", depth=2, width=64)
    before = sorted(map(tuple, spark.read.parquet(art).collect()))

    def boom(out, path, **kw):
        raise OSError("simulated crash mid temp-dir write")

    monkeypatch.setattr(
        "vectordbindexing_spark.streaming.cms.swap_in", boom
    )
    b2 = spark.range(50).select(F.lit("t3").alias("tok"))
    try:
        merge_cms_batch(b2, 1, art, "tok", depth=2, width=64)
    except OSError:
        pass
    after = sorted(map(tuple, spark.read.parquet(art).collect()))
    assert after == before  # accumulated state survived the crash
    monkeypatch.undo()
    assert merge_cms_batch(b2, 1, art, "tok", depth=2, width=64)
    _, ledger = split_artifact(spark.read.parquet(art))
    assert {r["bucket"] for r in ledger.collect()} == {0, 1}


def test_crash_between_rmtree_and_rename_recovers(spark, tmp_path,
                                                  monkeypatch):
    """The worst swap window: the old artifact dir is already removed
    and the complete replacement still sits at the temp path. The next
    merge's recover() must promote it — including the crashed batch's
    ledger entry, so the checkpoint replay of that batch no-ops
    (exactly-once holds across the crash)."""
    import os

    import vectordbindexing_spark.streaming.atomic as atomic

    art = str(tmp_path / "cms_art")
    b1 = spark.range(100).select(
        F.concat(F.lit("t"), (F.col("id") % 10).cast("string")).alias("tok")
    )
    assert merge_cms_batch(b1, 0, art, "tok", depth=2, width=64)

    real_rename = os.rename

    def boom(src, dst):
        if src.endswith(atomic.TMP_SUFFIX):
            raise OSError("simulated crash between rmtree and rename")
        return real_rename(src, dst)

    monkeypatch.setattr(atomic.os, "rename", boom)
    b2 = spark.range(50).select(F.lit("t3").alias("tok"))
    try:
        merge_cms_batch(b2, 1, art, "tok", depth=2, width=64)
    except OSError:
        pass
    assert not os.path.exists(art) and os.path.isdir(atomic.tmp_path(art))
    monkeypatch.undo()
    # stream restart replays batch 1: recover() promotes the orphaned
    # temp dir (which already merged batch 1), the ledger says so, and
    # the replay is a no-op — counters were added exactly once
    assert merge_cms_batch(b2, 1, art, "tok", depth=2, width=64) is False
    merged = spark.read.parquet(art)
    counters, ledger = split_artifact(merged)
    assert {r["bucket"] for r in ledger.collect()} == {0, 1}
    expected = _counters(
        cms_counters(
            spark.range(100).select(
                F.concat(F.lit("t"), (F.col("id") % 10).cast("string"))
                .alias("tok")
            ).unionByName(b2),
            "tok", depth=2, width=64,
        )
    )
    assert _counters(merged) == expected
