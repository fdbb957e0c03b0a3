"""atomic.py swap/recover contract: rename-aside never leaves a
partially-deleted live dir, recover() restores a complete state from
either sibling, bucket swaps replace only dirty partitions, and JSON
sidecars survive a crash mid-dump."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

import vectordbindexing_spark.streaming.atomic as atomic


def _write(spark, path, lo, hi):
    spark.range(lo, hi).coalesce(1).write.mode("overwrite").parquet(path)


def _vals(spark, path):
    return sorted(r["id"] for r in spark.read.parquet(path).collect())


def test_swap_in_replaces_and_cleans_siblings(spark, tmp_path):
    art = str(tmp_path / "art")
    _write(spark, art, 0, 5)
    atomic.swap_in(spark.range(10, 15), art)
    assert _vals(spark, art) == list(range(10, 15))
    assert not os.path.exists(atomic.tmp_path(art))
    assert not os.path.exists(atomic.old_path(art))


def test_recover_prefers_complete_tmp_over_partial_live(spark, tmp_path):
    """The VERDICT r08 #4 window: a crash mid-delete (legacy scheme) or
    external damage leaves a PARTIAL live dir while a complete temp dir
    holds the finished replacement — recover must install the temp dir,
    never read the partial live one."""
    art = str(tmp_path / "art")
    _write(spark, art, 0, 5)
    _write(spark, atomic.tmp_path(art), 10, 15)  # complete replacement
    os.remove(os.path.join(art, "_SUCCESS"))  # live now incomplete
    assert atomic.recover(art) is True
    assert os.path.exists(os.path.join(art, "_SUCCESS"))
    assert _vals(spark, art) == list(range(10, 15))
    assert not os.path.exists(atomic.tmp_path(art))


def test_recover_restores_aside_when_live_missing(spark, tmp_path):
    """Crash between rename(live, aside) and rename(tmp, live) with an
    INCOMPLETE temp dir: the aside (previous live) must come back."""
    art = str(tmp_path / "art")
    _write(spark, art, 0, 5)
    os.rename(art, atomic.old_path(art))  # mid-swap state
    _write(spark, atomic.tmp_path(art), 10, 15)
    os.remove(os.path.join(atomic.tmp_path(art), "_SUCCESS"))  # incomplete
    assert atomic.recover(art) is True
    assert _vals(spark, art) == list(range(0, 5))


def test_recover_sweeps_stale_aside_when_live_complete(spark, tmp_path):
    """Crash after rename(tmp, live), before rmtree(aside): live is the
    new state; the aside must be swept, not promoted."""
    art = str(tmp_path / "art")
    _write(spark, art, 10, 15)
    _write(spark, atomic.old_path(art), 0, 5)
    assert atomic.recover(art) is False
    assert _vals(spark, art) == list(range(10, 15))
    assert not os.path.exists(atomic.old_path(art))


def test_swap_never_exposes_partial_live(spark, tmp_path, monkeypatch):
    """Kill the swap at EVERY rename step: afterwards recover() always
    yields a complete live dir equal to either the old or new state —
    the 'crash at ANY point never destroys state' claim, now including
    the old scheme's rmtree window."""
    for fail_at in (1, 2):
        art = str(tmp_path / f"art{fail_at}")
        _write(spark, art, 0, 5)
        calls = {"n": 0}
        real_rename = os.rename

        def boom(src, dst, _fail_at=fail_at, _calls=calls):
            _calls["n"] += 1
            if _calls["n"] == _fail_at:
                raise OSError("simulated crash")
            return real_rename(src, dst)

        monkeypatch.setattr(atomic.os, "rename", boom)
        try:
            atomic.swap_in(spark.range(10, 15), art)
        except OSError:
            pass
        monkeypatch.undo()
        atomic.recover(art)
        got = _vals(spark, art)
        assert got in (list(range(0, 5)), list(range(10, 15))), (
            fail_at,
            got,
        )


def test_swap_in_buckets_touches_only_dirty_partitions(spark, tmp_path):
    art = str(tmp_path / "bkt")
    base = spark.range(100).select(
        (F.col("id") % 4).alias("bucket"), F.col("id").alias("v")
    )
    atomic.swap_in(base, art, coalesce=None, partition_by=["bucket"])
    mtimes = {
        n: os.path.getmtime(os.path.join(art, n))
        for n in os.listdir(art)
        if n.startswith("bucket=")
    }
    dirty = spark.createDataFrame(
        [(1, 1000), (1, 1001), (3, 3000)], "bucket int, v long"
    )
    assert atomic.swap_in_buckets(dirty, art) == 2
    live = spark.read.parquet(art)
    assert live.where(F.col("bucket") == 1).count() == 2
    assert live.where(F.col("bucket") == 3).count() == 1
    assert live.where(F.col("bucket") == 0).count() == 25  # untouched
    assert live.where(F.col("bucket") == 2).count() == 25
    # untouched bucket dirs were not rewritten
    for n, t in mtimes.items():
        if n in ("bucket=0", "bucket=2"):
            assert os.path.getmtime(os.path.join(art, n)) == t
    assert not os.path.exists(atomic.tmp_path(art))
    # every swapped bucket is individually complete for recover()
    assert os.path.exists(os.path.join(art, "bucket=1", "_SUCCESS"))


def test_recover_tree_recovers_buckets(spark, tmp_path):
    art = str(tmp_path / "bkt")
    base = spark.range(40).select(
        (F.col("id") % 2).alias("bucket"), F.col("id").alias("v")
    )
    atomic.swap_in(base, art, coalesce=None, partition_by=["bucket"])
    atomic.swap_in_buckets(
        spark.createDataFrame([(1, 7)], "bucket int, v long"), art
    )
    child = os.path.join(art, "bucket=1")
    os.rename(child, atomic.old_path(child))  # mid-swap crash on a child
    assert atomic.recover_tree(art) == 1
    assert spark.read.parquet(art).where(F.col("bucket") == 1).count() == 1


def test_write_json_atomic_survives_replace(tmp_path):
    p = str(tmp_path / "meta.json")
    atomic.write_json_atomic(p, {"a": 1})
    atomic.write_json_atomic(p, {"a": 2})
    assert json.load(open(p)) == {"a": 2}
    assert not os.path.exists(p + atomic.TMP_SUFFIX)


def test_spark_read_ignores_hidden_siblings(spark, tmp_path):
    """The hidden .<name>.tmp naming must keep Spark partition
    discovery away from in-flight bucket writes."""
    art = str(tmp_path / "bkt")
    base = spark.range(10).select(
        (F.col("id") % 2).alias("bucket"), F.col("id").alias("v")
    )
    atomic.swap_in(base, art, coalesce=None, partition_by=["bucket"])
    # simulate a leftover in-flight temp for a bucket INSIDE the dir
    leftover = atomic.tmp_path(os.path.join(art, "bucket=1"))
    shutil.copytree(os.path.join(art, "bucket=1"), leftover)
    assert spark.read.parquet(art).count() == 10  # not 15


def test_swap_in_buckets_expected_empties_a_dirty_bucket(spark, tmp_path):
    """A dirty bucket whose slice of the update came out EMPTY must
    lose its old rows, not silently keep them: pass the expected
    dirty-bucket list and the absent bucket swaps to a marker-only
    dir that reads as zero rows."""
    art = str(tmp_path / "bkt_empty")
    base = spark.range(40).select(
        (F.col("id") % 2).alias("bucket"), F.col("id").alias("v")
    )
    atomic.swap_in(base, art, coalesce=None, partition_by=["bucket"])
    out = spark.createDataFrame([(0, 999)], "bucket int, v long")
    # bucket 1 is dirty but contributes no output rows
    assert atomic.swap_in_buckets(out, art, expected=[0, 1]) == 2
    live = spark.read.parquet(art)
    assert live.where(F.col("bucket") == 0).count() == 1
    assert live.where(F.col("bucket") == 1).count() == 0  # stale rows gone
    # the emptied bucket is still a complete dir for recover()
    assert os.path.exists(os.path.join(art, "bucket=1", "_SUCCESS"))
    assert not os.path.exists(atomic.tmp_path(art))
