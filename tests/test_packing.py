"""Sequence-packing contract: interval partition of each shard stream,
window-coordinate arithmetic, determinism, empty docs, and Spark↔DuckDB
parity (all-integer oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.textops import pack_token_windows


def _docs(spark):
    rows = [
        (0, "a b c d e"),
        (1, "one two three"),
        (2, ""),
        (3, None),
        (4, " ".join(f"w{i}" for i in range(23))),
        (5, "x"),
        (6, " ".join(f"t{i}" for i in range(11))),
        (7, "p q"),
        (8, " ".join(f"z{i}" for i in range(7))),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_intervals_partition_each_shard(spark):
    out = pack_token_windows(
        _docs(spark), seq_len=8, n_shards=2
    ).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(out) == 9
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["tok_start"])
        pos = 0
        for r in rows:
            assert r["tok_start"] == pos  # gapless, non-overlapping
            assert r["tok_end"] - r["tok_start"] == r["n_tokens"]
            pos = r["tok_end"]
    # packing is 100% efficient by construction: total interval length
    # equals total tokens
    assert sum(r["n_tokens"] for r in out) == sum(
        max(r["tok_end"] for r in rows) for rows in by_shard.values()
    )


def test_window_coordinates(spark):
    out = {
        r["doc_id"]: r
        for r in pack_token_windows(
            _docs(spark), seq_len=8, n_shards=1
        ).collect()
    }
    for r in out.values():
        assert r["seq_first"] == r["tok_start"] // 8
        if r["n_tokens"] > 0:
            assert r["seq_last"] == (r["tok_end"] - 1) // 8
        else:
            # empty doc sits at a point: same window both ends
            assert r["seq_last"] == r["seq_first"]
            assert r["crosses_boundary"] == 0
        assert r["crosses_boundary"] == int(r["seq_last"] > r["seq_first"])
    # with seq_len=8 and 52 total tokens in one shard, some doc must
    # actually cross a boundary — the scenario packing exists for
    assert any(r["crosses_boundary"] == 1 for r in out.values())


def test_deterministic_and_content_independent(spark):
    a = sorted(
        map(tuple, pack_token_windows(_docs(spark), 8, 4).collect())
    )
    b = sorted(
        map(tuple, pack_token_windows(_docs(spark), 8, 4).collect())
    )
    assert a == b
    # shard assignment depends only on the id hash, not the text
    relabeled = _docs(spark).withColumn(
        "text", F.concat(F.coalesce("text", F.lit("")), F.lit(""))
    )
    c = {
        r["doc_id"]: r["shard"]
        for r in pack_token_windows(relabeled, 8, 4).collect()
    }
    assert c == {
        r["doc_id"]: r["shard"]
        for r in pack_token_windows(_docs(spark), 8, 4).collect()
    }


def test_oracle_parity_duckdb(spark, sf_dir):
    duckdb = pytest.importorskip("duckdb")
    import os

    import __spark_entry__ as entry
    from vectordbindexing_spark import oracles

    sdf = entry.queries()["text_pack_windows"](spark, sf_dir)
    srows = sorted(map(tuple, ((int(v) for v in r) for r in sdf.collect())))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    orows = sorted(
        tuple(int(v) for v in row)
        for row in con.execute(
            oracles.pack_token_windows_sql(seq_len=512, n_shards=8)
        ).fetchall()
    )
    assert srows == orows
