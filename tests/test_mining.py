"""Triplet / hard-negative mining: hand pins, python parity, label
guardrail, and the real-embeddings DuckDB replay staged for r08."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark import oracles
from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.mining import mine_triplets

# 2-d points, two labels; distances easy to eyeball (cosine)
EMB = [
    (0, [1.0, 0.0], 0),
    (1, [0.9, 0.1], 0),    # near 0, same label -> its positive
    (2, [0.0, 1.0], 1),
    (3, [0.1, 0.9], 1),
    (4, [0.7, 0.7], 1),    # the hard negative for anchors 0/1
]


def _cosd(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return 1.0 - num / (math.sqrt(sum(x * x for x in a))
                        * math.sqrt(sum(x * x for x in b)))


def _py_triplets(emb, k_neg):
    out = {}
    for aid, av, al in emb:
        same = sorted(
            ((_cosd(av, bv), bid) for bid, bv, bl in emb
             if bl == al and bid != aid)
        )
        other = sorted(
            ((_cosd(av, bv), bid) for bid, bv, bl in emb if bl != al)
        )
        if not same or not other:
            continue
        pd_, pid = same[0]
        for rank, (nd, nid) in enumerate(other[:k_neg], 1):
            out[(aid, rank)] = (pid, nid, round(nd - pd_, 6))
    return out


def _df(spark):
    return spark.createDataFrame(
        EMB, "id long, vec array<double>, label long"
    )


def test_triplets_hand_pins(spark):
    got = {
        (r["anchor_id"], r["neg_rank"]):
            (r["pos_id"], r["neg_id"], r["margin"])
        for r in mine_triplets(_df(spark), k_neg=2).collect()
    }
    # anchor 0: positive 1; hardest negative 4 (cos 45deg beats 2/3)
    assert got[(0, 1)][0] == 1 and got[(0, 1)][1] == 4
    # anchor 4 (label 1): positive is 3 (or 2) nearest same-label;
    # nearest negatives are 0/1 side
    assert got[(4, 1)][1] in (0, 1)
    # margins: hard negative close to anchor 0 -> small positive margin
    assert got[(0, 1)][2] > 0


def test_triplets_python_parity(spark):
    got = {
        (r["anchor_id"], r["neg_rank"]):
            (r["pos_id"], r["neg_id"], r["margin"])
        for r in mine_triplets(_df(spark), k_neg=3).collect()
    }
    want = _py_triplets(EMB, 3)
    assert got.keys() == want.keys()
    for key in want:
        assert got[key][0] == want[key][0] and got[key][1] == want[key][1]
        assert got[key][2] == pytest.approx(want[key][2], abs=2e-6)


def test_triplets_drops_singleton_labels(spark):
    emb = EMB + [(9, [0.5, -0.5], 7)]  # label 7 has no peer -> no pos
    df = spark.createDataFrame(emb, "id long, vec array<double>, label long")
    rows = mine_triplets(df, k_neg=2).collect()
    assert all(r["anchor_id"] != 9 for r in rows)
    # but 9 can still appear as a negative for others
    assert any(r["neg_id"] == 9 for r in rows)


def test_triplets_label_guardrail(spark):
    emb = [(i, [float(i), 1.0], i) for i in range(70)]  # 70 labels
    df = spark.createDataFrame(emb, "id long, vec array<double>, label long")
    with pytest.raises(ValueError):
        mine_triplets(df)


def test_triplets_label_guardrail_bounded_probe(spark):
    """A HIGH-cardinality label column must raise via the
    limit(MAX_LABELS+1) probe, never a full distinct collect — 200k
    distinct labels through the guard without pulling them down."""
    big = spark.range(200_000).select(
        F.col("id"),
        F.array(F.col("id").cast("double"), F.lit(1.0)).alias("vec"),
        F.col("id").alias("label"),
    )
    with pytest.raises(ValueError, match="MAX_LABELS"):
        mine_triplets(big)


def test_triplets_duckdb_replay_real_embeddings(spark, sf_dir):
    """The exact comparison the r08 contract query will run."""
    import __spark_entry__ as e

    srows = sorted(tuple(r) for r in e._mine_triplets(spark, sf_dir).collect())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    drows = sorted(
        tuple(r) for r in con.sql(oracles.mine_triplets_sql(k_neg=5)).fetchall()
    )
    assert srows == drows
    assert len(srows) == 500 * 5  # every anchor has peers + negatives
    # hardness signal: some margins must be small/negative (hard
    # triplets exist in clustered data)
    margins = [r[7] for r in srows]
    assert min(margins) < 0.5


def test_triplets_fused_matches_split(spark):
    """The fused single-scan kernel (impl='exact' under the broadcast
    budget) must reproduce the per-label split passes bit-for-bit —
    on the hand data and on clustered data where every label slice is
    non-trivial."""
    import random

    fused = sorted(
        tuple(r) for r in mine_triplets(_df(spark), k_neg=3).collect()
    )
    split = sorted(
        tuple(r)
        for r in mine_triplets(_df(spark), k_neg=3, impl="split").collect()
    )
    assert fused == split
    rng = random.Random(11)
    emb = [
        (
            i,
            [rng.gauss(0, 1) + 3 * (i % 3), rng.gauss(0, 1), rng.gauss(0, 1)],
            i % 5,
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(emb, "id long, vec array<double>, label long")
    for metric in ("cosine", "l2"):
        fused = sorted(
            tuple(r)
            for r in mine_triplets(df, k_neg=4, metric=metric).collect()
        )
        split = sorted(
            tuple(r)
            for r in mine_triplets(
                df, k_neg=4, metric=metric, impl="split"
            ).collect()
        )
        assert fused == split, metric


def test_triplets_auto_route_matches_exact_at_small_scale(spark):
    """impl='auto' below every planner threshold routes each slice to
    exact-blocked — the output must equal impl='exact' bit-for-bit
    (including the k=2-drop-self positive equivalence)."""
    exact = sorted(
        tuple(r) for r in mine_triplets(_df(spark), k_neg=2).collect()
    )
    auto = sorted(
        tuple(r)
        for r in mine_triplets(_df(spark), k_neg=2, impl="auto").collect()
    )
    assert auto == exact


def test_triplets_auto_pos_handles_duplicate_vectors(spark):
    """Duplicate vectors (dist-0 ties with self) must resolve to the
    same lowest-id positive under both impls."""
    emb = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.0], 0),   # exact duplicate of 0
        (2, [1.0, 0.0], 0),   # another duplicate
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
    ]
    df = spark.createDataFrame(emb, "id long, vec array<double>, label long")
    for impl in ("exact", "auto"):
        pos = {
            r["anchor_id"]: r["pos_id"]
            for r in mine_triplets(df, k_neg=1, impl=impl).collect()
        }
        assert pos[0] == 1 and pos[1] == 0 and pos[2] == 0, impl


def test_triplets_auto_forced_approximate_route(spark):
    """Force the IVF route with a tiny exact_base_limit: schema and
    label semantics must hold and recall vs the exact mining must be
    high on clustered data — the corpus-scale path, exercised
    end-to-end."""
    import random

    rng = random.Random(7)
    emb = []
    for i in range(400):
        lab = i % 4
        center = [[4, 0], [0, 4], [-4, 0], [0, -4]][lab]
        emb.append(
            (i, [center[0] + rng.gauss(0, 1), center[1] + rng.gauss(0, 1)],
             lab)
        )
    df = spark.createDataFrame(emb, "id long, vec array<double>, label long")
    auto = mine_triplets(
        df, k_neg=3, metric="l2", impl="auto",
        planner_kwargs={"exact_base_limit": 10},
    )
    rows = auto.collect()
    assert auto.columns == [
        "anchor_id", "anchor_label", "pos_id", "pos_dist", "neg_rank",
        "neg_id", "neg_dist", "margin",
    ]
    lab_of = {i: e[2] for i, e in enumerate(emb)}
    assert all(lab_of[r["neg_id"]] != r["anchor_label"] for r in rows)
    assert all(lab_of[r["pos_id"]] == r["anchor_label"] for r in rows)
    exact_pairs = {
        (r["anchor_id"], r["neg_id"])
        for r in mine_triplets(df, k_neg=3, metric="l2").collect()
    }
    auto_pairs = {(r["anchor_id"], r["neg_id"]) for r in rows}
    recall = len(auto_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"approximate-route negative recall {recall}"
