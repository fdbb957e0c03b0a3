"""Silhouette coefficients: hand pins, sklearn-free python parity,
singleton convention, and the real-embeddings DuckDB replay staged
for r08."""

from __future__ import annotations

import math

import duckdb
import pytest

from vectordbindexing_spark import oracles
from vectordbindexing_spark.operators.silhouette import silhouette

# two tight clusters + one boundary point + a singleton cluster
PTS = [
    (0, [1.0, 0.0], 0),
    (1, [0.95, 0.05], 0),
    (2, [0.0, 1.0], 1),
    (3, [0.05, 0.95], 1),
    (4, [0.6, 0.6], 0),     # assigned to 0 but sits between
    (5, [-1.0, 0.0], 7),    # singleton cluster
]


def _cosd(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return 1.0 - num / (math.sqrt(sum(x * x for x in a))
                        * math.sqrt(sum(x * x for x in b)))


def _py_silhouette(pts):
    out = {}
    for i, vi, ci in pts:
        same = [_cosd(vi, vj) for j, vj, cj in pts if cj == ci and j != i]
        others = {}
        for j, vj, cj in pts:
            if cj != ci:
                others.setdefault(cj, []).append(_cosd(vi, vj))
        a = sum(same) / len(same) if same else 0.0
        b = min((sum(v) / len(v) for v in others.values()), default=None)
        if not same or b is None or max(a, b) <= 0:
            s = 0.0
        else:
            s = (b - a) / max(a, b)
        out[i] = (ci, round(a, 6), round(b or 0.0, 6), round(s, 6))
    return out


def _df(spark):
    return spark.createDataFrame(
        PTS, "id long, vec array<double>, cluster long"
    )


def test_silhouette_hand_pins(spark):
    got = {r["id"]: (r["cluster"], r["a_intra"], r["b_inter"],
                     r["silhouette"])
           for r in silhouette(_df(spark)).collect()}
    # tight pair 2/3 score high
    assert got[2][3] > 0.5 and got[3][3] > 0.5
    # the boundary point scores worst within cluster 0
    assert got[4][3] < got[0][3] and got[4][3] < got[1][3]
    # singleton convention: s = 0 exactly
    assert got[5][3] == 0.0


def test_silhouette_python_parity(spark):
    got = {r["id"]: (r["cluster"], r["a_intra"], r["b_inter"],
                     r["silhouette"])
           for r in silhouette(_df(spark)).collect()}
    want = _py_silhouette(PTS)
    assert got.keys() == want.keys()
    for i in want:
        assert got[i][0] == want[i][0]
        for k in (1, 2, 3):
            assert got[i][k] == pytest.approx(want[i][k], abs=2e-6), (i, k)


def test_silhouette_duckdb_replay_values(spark):
    srows = sorted(tuple(r) for r in silhouette(_df(spark)).collect())
    vals = ", ".join(
        f"({i}, {v}::DOUBLE[], {c})" for i, v, c in PTS
    )
    sql = oracles.silhouette_sql(
        f"SELECT * FROM (VALUES {vals}) t(id, v, cluster)"
    )
    con = duckdb.connect()
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows and len(srows) == 6


def test_silhouette_duckdb_replay_real_embeddings(spark, sf_dir):
    """The exact comparison the r08 contract query will run."""
    import __spark_entry__ as e

    srows = sorted(
        tuple(r) for r in e._cluster_silhouette(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    sql = oracles.silhouette_sql(
        "SELECT vec_id AS id, embedding::DOUBLE[] AS v, label AS cluster "
        "FROM embeddings WHERE vec_id < 300"
    )
    drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert srows == drows and len(srows) == 300
    # the testdata labels are NOT geometric clusters, so the mean
    # silhouette is rightly ~0 — assert only the definitional range
    # and that scores are non-constant
    assert all(-1.0 <= r[4] <= 1.0 for r in srows)
    assert len({r[4] for r in srows}) > 10


def _py_simplified(pts):
    from collections import defaultdict

    sums, cnt = defaultdict(lambda: None), defaultdict(int)
    for _, v, c in pts:
        cnt[c] += 1
        if sums[c] is None:
            sums[c] = list(v)
        else:
            sums[c] = [a + b for a, b in zip(sums[c], v)]
    cents = {c: [x / cnt[c] for x in s] for c, s in sums.items()}
    out = {}
    for i, v, c in pts:
        a = _cosd(v, cents[c])
        others = sorted(
            (_cosd(v, cents[o]), o) for o in cents if o != c
        )
        b = others[0][0] if others else None
        if cnt[c] <= 1 or b is None or max(a, b) <= 0:
            s = 0.0
        else:
            s = (b - a) / max(a, b)
        out[i] = (c, round(a, 6), round(b or 0.0, 6), round(s, 6))
    return out


def test_simplified_silhouette_python_parity(spark):
    from vectordbindexing_spark.operators.silhouette import (
        simplified_silhouette,
    )

    got = {
        r["id"]: (
            r["cluster"], r["a_intra"], r["b_inter"], r["silhouette"]
        )
        for r in simplified_silhouette(_df(spark)).collect()
    }
    want = _py_simplified(PTS)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0]
        for g, w in zip(got[i][1:], want[i][1:]):
            assert abs(g - w) < 1e-6, (i, got[i], want[i])


def test_simplified_silhouette_agrees_with_exact_on_tight_clusters(spark):
    """On well-separated tight clusters the centroid variant must agree
    with the exact operator on the SIGN and rough magnitude — tight
    members near 1, the singleton exactly 0."""
    from vectordbindexing_spark.operators.silhouette import (
        silhouette,
        simplified_silhouette,
    )

    df = _df(spark)
    ex = {r["id"]: r["silhouette"] for r in silhouette(df).collect()}
    si = {r["id"]: r["silhouette"] for r in simplified_silhouette(df).collect()}
    assert si[5] == 0.0  # singleton convention shared
    for i in (0, 1, 2, 3):
        assert si[i] > 0.5 and ex[i] > 0.5, (i, si[i], ex[i])
    # the boundary point scores low in both
    assert si[4] < 0.5 and ex[4] < 0.5


def test_simplified_silhouette_plan_has_no_pair_join(spark):
    """The scale contract: k·d centroid rows broadcast back, ONE scan
    of the points, and no O(n²) join anywhere in the plan."""
    import contextlib
    import io

    from vectordbindexing_spark.operators.silhouette import (
        simplified_silhouette,
    )

    df = _df(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        simplified_silhouette(df).explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the centroid side arrives broadcast
    assert "Broadcast" in plan


def test_simplified_silhouette_exact_mean_auto_switch(spark, monkeypatch):
    """Default exact_mean=None folds below SIMPLIFIED_FOLD_CELL_LIMIT
    (bit-equal to exact_mean=True) and avg()s past it (equal after
    round-6 on this data)."""
    import vectordbindexing_spark.operators.silhouette as sil

    df = _df(spark)
    auto = sorted(
        tuple(r) for r in sil.simplified_silhouette(df).collect()
    )
    fold = sorted(
        tuple(r)
        for r in sil.simplified_silhouette(df, exact_mean=True).collect()
    )
    assert auto == fold  # small input -> auto picked the fold

    monkeypatch.setattr(sil, "SIMPLIFIED_FOLD_CELL_LIMIT", 1)
    low = sorted(
        tuple(r) for r in sil.simplified_silhouette(df).collect()
    )
    avg = sorted(
        tuple(r)
        for r in sil.simplified_silhouette(df, exact_mean=False).collect()
    )
    assert low == avg == fold  # round-6 output equal on this data


def test_simplified_silhouette_duckdb_replay_real_embeddings(spark, sf_dir):
    """Driver-identical hash compare of the r09 contract query against
    oracles.simplified_silhouette_sql on the real embeddings table."""
    from vectordbindexing_spark.operators.silhouette import (
        simplified_silhouette,
    )
    from vectordbindexing_spark.io.tables import load_table
    import pyspark.sql.functions as SF

    emb = load_table(spark, sf_dir, "embeddings").where(
        SF.col("vec_id") < 300
    )
    got = sorted(
        tuple(r)
        for r in simplified_silhouette(
            emb, id_col="vec_id", vec_col="embedding", cluster_col="label"
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            oracles.simplified_silhouette_sql(
                "SELECT vec_id AS id, embedding::DOUBLE[] AS v, "
                "label AS cluster FROM embeddings WHERE vec_id < 300"
            )
        ).fetchall()
    )
    assert got == want and len(got) == 300
