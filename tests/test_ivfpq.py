"""IVF-PQ composite tests: full-probe equivalence with plain PQ (pruning
and compression are orthogonal), pruning-bounds-candidates, recall floor
vs exact KNN."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.exact_knn import exact_knn
from vectordbindexing_spark.operators.ivfpq import ivfpq_knn
from vectordbindexing_spark.operators.pq import pq_fit, pq_knn


@pytest.fixture(scope="module")
def emb_split(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 10 == 0)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    return q, b


KW = dict(q_id="vec_id", q_vec="embedding", b_id="vec_id", b_vec="embedding")


def test_full_probe_equals_plain_pq(spark, emb_split):
    """nprobe == nlist admits every cell, so the result must be IDENTICAL
    to the plain PQ ADC scan with the same codebooks — the coarse
    quantizer only prunes, it never changes distances."""
    q, b = emb_split
    books = pq_fit(b, m=8, ks=16, max_iter=2, id_col="vec_id",
                   vec_col="embedding")
    full = ivfpq_knn(q, b, k=10, nlist=8, nprobe=8, m=8, ks=16,
                     max_iter=2, codebooks=books, **KW).toPandas()
    plain = pq_knn(q, b, k=10, codebooks=books, **KW).toPandas()
    key = ["qid", "nbr_rank"]
    full = full.sort_values(key).reset_index(drop=True)
    plain = plain.sort_values(key).reset_index(drop=True)
    assert full["neighbor_id"].tolist() == plain["neighbor_id"].tolist()
    np.testing.assert_array_equal(
        full["dist"].to_numpy(), plain["dist"].to_numpy()
    )


def test_pruning_bounds_candidates_and_recall(spark, emb_split):
    q, b = emb_split
    pruned = ivfpq_knn(q, b, k=10, nlist=16, nprobe=4, m=8, ks=16,
                       max_iter=3, **KW)
    ex = exact_knn(q, b, k=10, metric="l2", impl="blocked", **KW)
    gp = pruned.groupBy("qid").agg(F.collect_set("neighbor_id").alias("p"))
    ep = ex.groupBy("qid").agg(F.collect_set("neighbor_id").alias("g"))
    r = (
        gp.join(ep, "qid")
        .select((F.size(F.array_intersect("p", "g")) / 10.0).alias("r"))
        .agg(F.avg("r").alias("r"))
        .collect()[0]["r"]
    )
    # 4/16 cells probed + 32-bit codes: lossy twice over, but must stay
    # far above chance (10/|base| ≈ 0.02)
    assert r > 0.15
    # every query still gets k rows (probed cells hold >= k rows here)
    counts = pruned.groupBy("qid").count().select("count").distinct().collect()
    assert [c["count"] for c in counts] == [10]


def test_results_come_only_from_probed_cells(spark, emb_split):
    """Structural pruning invariant: every returned neighbor lives in a
    cell its query probed — verified against an independent numpy
    computation of the probe sets and cell assignments. (Recall is NOT
    monotone in nprobe under ADC distances — extra candidates can
    displace true neighbors with closer-by-ADC impostors — so the
    invariant to pin is membership, not recall.)"""
    from vectordbindexing_spark.operators.ivf import ivf_assign, kmeans_fit

    q, b = emb_split
    cents = kmeans_fit(
        b, 16, max_iter=3, id_col="vec_id", vec_col="embedding"
    )
    got = ivfpq_knn(q, b, k=10, nlist=16, nprobe=2, m=8, ks=16,
                    max_iter=3, centroids=cents, **KW).collect()
    cell_of = {
        r["id"]: r["cid"]
        for r in ivf_assign(
            b, cents, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    qrows = q.select("vec_id", "embedding").collect()
    probes = {}
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        d2 = ((qv[None, :] - cents) ** 2).sum(axis=1)
        probes[r["vec_id"]] = set(
            np.lexsort((np.arange(len(cents)), d2))[:2].tolist()
        )
    assert got
    for row in got:
        assert cell_of[row["neighbor_id"]] in probes[row["qid"]], row


def test_persisted_artifact_matches_inmemory_and_prunes(
    spark, emb_split, tmp_path
):
    """save -> ivfpq_search_index must equal the in-memory ivfpq_knn with
    the same arrays, and the codes scan must partition-prune to the
    probed cells (PartitionFilters with cid IN (...) in the plan)."""
    from vectordbindexing_spark.operators.ivf import kmeans_fit
    from vectordbindexing_spark.operators.ivfpq import (
        ivfpq_search_index,
        save_ivfpq_index,
    )

    q, b = emb_split
    cents = kmeans_fit(b, 16, max_iter=2, id_col="vec_id", vec_col="embedding")
    books = pq_fit(b, m=8, ks=16, max_iter=2, id_col="vec_id",
                   vec_col="embedding")
    path = str(tmp_path / "ivfpq_idx")
    save_ivfpq_index(b, cents, books, path, b_id="vec_id", b_vec="embedding")

    mem = ivfpq_knn(q, b, k=10, nprobe=4, centroids=cents, codebooks=books,
                    **KW).toPandas()
    art_df = ivfpq_search_index(q, path, k=10, nprobe=4,
                                q_id="vec_id", q_vec="embedding")
    art = art_df.toPandas()
    key = ["qid", "nbr_rank"]
    mem = mem.sort_values(key).reset_index(drop=True)
    art = art.sort_values(key).reset_index(drop=True)
    assert mem["neighbor_id"].tolist() == art["neighbor_id"].tolist()
    np.testing.assert_array_equal(mem["dist"].to_numpy(), art["dist"].to_numpy())

    plan = art_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan


def test_planner_routes_memory_tight_to_ivfpq(spark, emb_split, monkeypatch):
    import vectordbindexing_spark.plans.knn_planner as kp

    p = kp.plan_knn(100, 5_000_000, 10, approximate_ok=True,
                    repeated_queries=True, memory_tight=True)
    assert p.strategy == "ivfpq"
    # dispatch end-to-end with shrunken thresholds
    monkeypatch.setattr(kp, "EXACT_BASE_LIMIT", 10)
    q, b = emb_split
    out = kp.knn(q.limit(5), b, k=3, approximate_ok=True,
                 repeated_queries=True, memory_tight=True,
                 q_id="vec_id", q_vec="embedding",
                 b_id="vec_id", b_vec="embedding")
    assert out.count() == 15
    assert set(out.columns) == {"qid", "nbr_rank", "neighbor_id", "dist"}
