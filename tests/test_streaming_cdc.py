"""CDC maintainer: upserts/tombstones, change log, replay idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordbindexing_spark.streaming.cdc import (
    latest_per_key,
    merge_cdc_batch,
    run_cdc_ingest,
)

SCHEMA = "k long, val string, version long, deleted boolean"


def _b(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snap(spark, path):
    return {
        (r["k"], r["val"])
        for r in spark.read.parquet(path).collect()
    }


def _log(spark, path):
    return sorted(
        (r["k"], r["change"])
        for r in spark.read.parquet(path).collect()
    )


def test_upsert_delete_and_changelog(spark, tmp_path):
    snap = str(tmp_path / "snap")
    log = str(tmp_path / "log")
    b1 = _b(spark, [(1, "a", 1, False), (2, "b", 1, False),
                    (3, "c", 1, False)])
    merge_cdc_batch(b1, snap, log, ["k"])
    assert _snap(spark, snap) == {(1, "a"), (2, "b"), (3, "c")}
    assert _log(spark, log) == [(1, "added"), (2, "added"), (3, "added")]

    b2 = _b(spark, [(2, "B", 2, False), (3, None, 2, True),
                    (4, "d", 2, False), (1, "a", 2, False)])
    merge_cdc_batch(b2, snap, log, ["k"])
    assert _snap(spark, snap) == {(1, "a"), (2, "B"), (4, "d")}
    # k=1 re-upserted with same value -> unchanged, NOT in the log
    assert _log(spark, log) == [
        (1, "added"), (2, "added"), (2, "changed"),
        (3, "added"), (3, "removed"), (4, "added"),
    ]


def test_intra_batch_latest_version_wins(spark, tmp_path):
    snap = str(tmp_path / "snap")
    log = str(tmp_path / "log")
    b = _b(spark, [(7, "old", 1, False), (7, "new", 2, False)])
    merge_cdc_batch(b, snap, log, ["k"])
    assert _snap(spark, snap) == {(7, "new")}


def test_replay_is_idempotent(spark, tmp_path):
    snap = str(tmp_path / "snap")
    log = str(tmp_path / "log")
    b1 = _b(spark, [(1, "a", 1, False), (2, "b", 1, False)])
    merge_cdc_batch(b1, snap, log, ["k"])
    before_log = _log(spark, log)
    merge_cdc_batch(b1, snap, log, ["k"])  # crash-replay of same batch
    assert _snap(spark, snap) == {(1, "a"), (2, "b")}
    assert _log(spark, log) == before_log  # no phantom change rows


def test_streaming_feed(spark, tmp_path):
    src = str(tmp_path / "feed")
    b1 = _b(spark, [(1, "a", 1, False), (2, "b", 1, False)])
    b2 = _b(spark, [(2, "B", 2, False), (1, None, 2, True)])
    b1.write.parquet(src + "/a")
    b2.write.parquet(src + "/b")
    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).option("recursiveFileLookup", "true").parquet(src)
    snap = str(tmp_path / "snap")
    log = str(tmp_path / "log")
    q = run_cdc_ingest(stream, snap, log, str(tmp_path / "ck"), ["k"])
    q.awaitTermination(120)
    final = _snap(spark, snap)
    # file order decides whether b2's delete lands before or after
    # b1's insert of k=1; both end states are key-consistent
    assert final in ({(2, "B")}, {(2, "B"), (1, "a")})
    assert (2, "added") in _log(spark, log)
