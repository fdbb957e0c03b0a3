"""SemDeDup contract: planted near-duplicates group together, distant
vectors stay singletons, pairs respect cluster boundaries, threshold
monotonicity, and DuckDB oracle parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.semdedup import (
    semantic_dedup,
    semantic_neardup_pairs,
)


def _planted(spark, n_groups=6, dup_per_group=3, d=16, seed=3):
    """Well-separated anchors, each with near-copies (tiny jitter) —
    plus isolated singles."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    truth = {}
    anchors = rng.normal(size=(n_groups, d)) * 5.0
    for g in range(n_groups):
        for _ in range(dup_per_group):
            v = anchors[g] + rng.normal(size=d) * 0.01
            rows.append((vid, [float(x) for x in v]))
            truth[vid] = g
            vid += 1
    for _ in range(10):  # singles, far from anchors and each other
        v = rng.normal(size=d) * 5.0 + 40.0 * rng.normal(size=d)
        rows.append((vid, [float(x) for x in v]))
        truth[vid] = None
        vid += 1
    df = spark.createDataFrame(rows, schema="id long, vec array<double>")
    return df, truth


def test_planted_duplicates_group(spark):
    df, truth = _planted(spark)
    out = semantic_dedup(
        df, n_clusters=6, threshold=0.95, id_col="id", vec_col="vec"
    ).collect()
    groups = {r["id"]: r["group_id"] for r in out}
    keepers = {r["id"] for r in out if r["is_keeper"]}
    # same planted group → same group_id; keeper is the min id
    by_truth: dict[int, set] = {}
    for vid, g in truth.items():
        if g is not None:
            by_truth.setdefault(g, set()).add(vid)
    for members in by_truth.values():
        gids = {groups[m] for m in members}
        assert len(gids) == 1
        assert gids == {min(members)}
        assert keepers & members == {min(members)}
    # singles keep themselves
    for vid, g in truth.items():
        if g is None:
            assert groups[vid] == vid and vid in keepers
    # every input row is assigned
    assert len(out) == len(truth)


def test_pairs_within_cells_and_threshold_monotone(spark):
    df, _ = _planted(spark, seed=9)
    from vectordbindexing_spark.operators.ivf import ivf_assign, kmeans_fit

    cents = kmeans_fit(
        df.selectExpr("id", "vec"), 6, max_iter=3, id_col="id",
        vec_col="vec",
    )
    cells = {
        r["id"]: r["cid"]
        for r in ivf_assign(df, cents, id_col="id", vec_col="vec").collect()
    }
    loose = semantic_neardup_pairs(
        df, n_clusters=6, threshold=0.5, id_col="id", vec_col="vec",
        centroids=cents,
    ).collect()
    tight = semantic_neardup_pairs(
        df, n_clusters=6, threshold=0.99, id_col="id", vec_col="vec",
        centroids=cents,
    ).collect()
    loose_set = {(r["id_a"], r["id_b"]) for r in loose}
    tight_set = {(r["id_a"], r["id_b"]) for r in tight}
    assert tight_set <= loose_set  # tighter threshold only removes pairs
    for a, b in loose_set:
        assert a < b
        assert cells[a] == cells[b]  # never cross-cell
    for r in loose:
        assert r["sim"] >= 0.5 - 1e-9


def test_null_vectors_excluded(spark):
    rows = [(0, [1.0, 0.0]), (1, None), (2, [1.0, 1e-4])]
    df = spark.createDataFrame(rows, schema="id long, vec array<double>")
    out = semantic_dedup(
        df, n_clusters=1, threshold=0.9, id_col="id", vec_col="vec"
    ).collect()
    assert {r["id"] for r in out} == {0, 2}
    assert {r["group_id"] for r in out} == {0}  # near-parallel → one group


def test_oracle_parity_duckdb(spark, sf_dir):
    duckdb = pytest.importorskip("duckdb")
    import os

    import __spark_entry__ as entry
    from vectordbindexing_spark import oracles

    sdf = entry.queries()["semantic_dedup"](spark, sf_dir)
    srows = sorted(map(tuple, ((int(v) for v in r) for r in sdf.collect())))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}')"
    )
    orows = sorted(
        tuple(int(v) for v in row)
        for row in con.execute(
            oracles.semantic_dedup_sql(n_clusters=8, threshold=0.4, iters=3)
        ).fetchall()
    )
    assert srows == orows
