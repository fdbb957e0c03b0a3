"""Exact k-nearest-neighbor join (the brute-force KNN of SURVEY §2.4).

Reference semantics: all-pairs distance then per-query top-k
(`roargraph_python.py:155-162` — full distance matrix + argsort[:k];
FAISS IndexFlat in the notebooks). Two Spark physical strategies:

* ``impl="expr"``  — declarative theta join: crossJoin + distance
  expression + rank window. Catalyst handles broadcast of the small side
  and AQE coalescing. This is the oracle-matching formulation and is also
  what you want when *both* sides are large but the candidate set was
  already pruned (e.g. after an LSH bucket join).

* ``impl="blocked"`` — broadcast the query matrix (queries are the small
  side in batch serving), stream the base table through a numpy matmul
  kernel with ``mapInPandas``, emitting only a *partial top-k per Arrow
  batch* (k·n_q rows per batch, never the full distance matrix), then a
  final global top-k window. This is the 100 TB path: one scan of base,
  no shuffle of vectors, shuffle volume O(batches · n_q · k).

Both accumulate in float64 so results agree with the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.vector import METRICS, metric_dist, to_double_array
from vectordbindexing_spark.operators.topk import (
    batch_topk_by_dist_id,
    topk_per_group,
)

_BLOCKED_THRESHOLD_QUERIES = 100_000  # above this, queries don't broadcast
# Per-task byte target for the blocked kernel's distance matrices; the
# query axis chunks to fit (memory O(target), not O(n_q · batch)).
_BLOCK_TARGET_BYTES = 128 * 1024 * 1024


def _pairwise_dist(
    Q: np.ndarray, B: np.ndarray, metric: str, weights: np.ndarray | None = None
) -> np.ndarray:
    """(n_q, d) × (n_b, d) → (n_q, n_b) float64 distance matrix."""
    if metric == "weighted_l2":
        # Σ w_k (q_k-b_k)² = (Q²·w) + (B²·w) - 2 (Q∘w)Bᵀ  (Idea-1023.md:72-82)
        qw = np.sum(Q * Q * weights, axis=1)
        bw = np.sum(B * B * weights, axis=1)
        cross = (Q * weights) @ B.T
        return np.maximum(qw[:, None] + bw[None, :] - 2.0 * cross, 0.0)
    if metric == "cosine":
        qn = np.linalg.norm(Q, axis=1)
        bn = np.linalg.norm(B, axis=1)
        return 1.0 - (Q @ B.T) / np.outer(qn, bn)
    if metric == "l2":
        # ||q-b||² = ||q||² + ||b||² - 2·q·b ; clamp tiny negatives from cancellation
        d2 = (
            np.sum(Q * Q, axis=1)[:, None]
            + np.sum(B * B, axis=1)[None, :]
            - 2.0 * (Q @ B.T)
        )
        return np.sqrt(np.maximum(d2, 0.0))
    if metric == "ip":
        return -(Q @ B.T)
    raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")


def exact_knn(
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    impl: str = "auto",
    q_id: str = "qid",
    q_vec: str = "vec",
    b_id: str = "id",
    b_vec: str = "vec",
    weights: list[float] | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k nearest base rows per query.

    Returns ``(qid, nbr_rank, neighbor_id, dist)`` with rank 1..k ordered
    by (dist asc, neighbor_id asc). ``metric='weighted_l2'`` (requires
    ``weights``, blocked impl only) is the Idea-1023 variance-scaled
    squared distance. ``exclude_self`` drops base rows whose id equals the
    query id *before* ranking (self-join graph builds) — cheaper than a
    post-filter, which would need a second ranking pass to repair ranks.
    Rows with NULL vectors (missing embeddings) are excluded on both
    sides — they cannot participate in a distance computation.
    """
    queries = queries.filter(F.col(q_vec).isNotNull())
    base = base.filter(F.col(b_vec).isNotNull())
    if metric == "weighted_l2":
        if weights is None:
            raise ValueError("weighted_l2 requires weights")
        return _exact_knn_blocked(
            queries, base, k, metric, q_id, q_vec, b_id, b_vec,
            weights=np.asarray(weights, dtype=np.float64),
            exclude_self=exclude_self,
        )
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    if impl == "auto":
        impl = "blocked"
    if impl == "expr":
        return _exact_knn_expr(
            queries, base, k, metric, q_id, q_vec, b_id, b_vec,
            exclude_self=exclude_self,
        )
    if impl == "blocked":
        return _exact_knn_blocked(
            queries, base, k, metric, q_id, q_vec, b_id, b_vec,
            exclude_self=exclude_self,
        )
    raise ValueError(f"unknown impl {impl!r}")


def _exact_knn_expr(
    queries, base, k, metric, q_id, q_vec, b_id, b_vec, exclude_self=False,
    weights=None,
) -> DataFrame:
    q = queries.select(
        F.col(q_id).cast("long").alias("qid"), to_double_array(q_vec).alias("_qv")
    )
    b = base.select(
        F.col(b_id).cast("long").alias("neighbor_id"), to_double_array(b_vec).alias("_bv")
    )
    if metric == "weighted_l2":
        from vectordbindexing_spark.functions.vector import weighted_l2_dist

        w_lit = F.array(*[F.lit(float(w)) for w in weights])
        dist = weighted_l2_dist("_qv", "_bv", w_lit)
    else:
        dist = metric_dist("_qv", "_bv", metric)
    # crossJoin: Catalyst broadcasts the smaller side (BroadcastNestedLoopJoin)
    pairs = q.crossJoin(b).withColumn("dist", dist)
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col("neighbor_id"))
    ranked = topk_per_group(
        pairs.select("qid", "neighbor_id", "dist"),
        ["qid"],
        "dist",
        k,
        tie_col="neighbor_id",
    )
    return ranked.select("qid", "nbr_rank", "neighbor_id", "dist")


def _exact_knn_blocked(
    queries, base, k, metric, q_id, q_vec, b_id, b_vec, weights=None,
    exclude_self=False,
) -> DataFrame:
    qsel = queries.select(
        F.col(q_id).cast("long").alias("qid"), F.col(q_vec).alias("v")
    )
    # bounded collect: limit(N+1) caps what can ever reach the driver, and
    # N+1 rows coming back IS the probe result ("too big — don't
    # broadcast") — one job instead of a count-probe plus a collect
    qrows = qsel.limit(_BLOCKED_THRESHOLD_QUERIES + 1).toPandas()
    if len(qrows) == 0 or len(qrows) > _BLOCKED_THRESHOLD_QUERIES:
        # empty, or query side too big to broadcast → declarative join
        return _exact_knn_expr(
            queries, base, k, metric, q_id, q_vec, b_id, b_vec,
            exclude_self=exclude_self,
            weights=None if weights is None else list(weights),
        )
    qids = qrows["qid"].to_numpy()
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qrows["v"]])
    return exact_knn_local_queries(
        qids, Q, base, k, metric, b_id=b_id, b_vec=b_vec,
        weights=weights, exclude_self=exclude_self,
    )


def exact_knn_local_queries(
    qids: np.ndarray,
    Q: np.ndarray,
    base: DataFrame,
    k: int,
    metric: str,
    b_id: str = "id",
    b_vec: str = "vec",
    weights: np.ndarray | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """The blocked kernel with DRIVER-LOCAL queries — for callers that
    already hold (and bounded-probed) the query rows, so they skip the
    per-call query-collect job (e.g. build_two_layer_index collects the
    node set ONCE and feeds both layers' kernels from it). Identical
    kernel, chunking and merge conventions as :func:`exact_knn`'s
    blocked impl — the refactor point is only where the (qids, Q)
    arrays come from. ``base`` rows with NULL vectors are excluded, as
    in exact_knn."""
    spark = base.sparkSession
    base = base.filter(F.col(b_vec).isNotNull())
    bc = spark.sparkContext.broadcast((qids, Q, weights))

    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bQ, bw = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            bids = pdf["bid"].to_numpy()
            kk = min(k, len(bids))
            # chunk the QUERY axis so the distance matrix stays under a
            # fixed byte target: a full n_q × batch matrix is 8 GB/task
            # at 100k broadcast queries × 10k-row batches — enough to
            # OOM a 32-task executor even though the math is fine. Each
            # query's per-batch top-k is independent, so chunking the
            # rows changes nothing downstream.
            cq = max(1, _BLOCK_TARGET_BYTES // max(1, 8 * len(bids)))
            for s in range(0, len(bqids), cq):
                D = _pairwise_dist(bQ[s : s + cq], B, metric, weights=bw)
                if exclude_self:
                    D[np.equal.outer(bqids[s : s + cq], bids)] = np.inf
                # exact per-batch (dist, id) selection — duplicate
                # vectors tie exactly, and an argpartition cut at a tie
                # boundary would keep/drop them by batch position
                # instead of the lowest-id convention the merge window
                # and oracle use
                nbr, rows_d = batch_topk_by_dist_id(D, bids, kk)
                yield pd.DataFrame(
                    {
                        "qid": np.repeat(bqids[s : s + cq], kk),
                        "neighbor_id": nbr.ravel(),
                        "dist": rows_d.ravel(),
                    }
                )

    from vectordbindexing_spark.plans.partitioning import repartition_for_compute

    b = repartition_for_compute(
        base.select(F.col(b_id).cast("long").alias("bid"), F.col(b_vec).alias("v"))
    )
    partial = b.mapInPandas(
        partial_topk, schema="qid long, neighbor_id long, dist double"
    )
    if exclude_self:
        # masked self-distances are +inf; drop any that survived a small batch
        partial = partial.filter(F.col("dist") != float("inf"))
    ranked = topk_per_group(partial, ["qid"], "dist", k, tie_col="neighbor_id")
    return ranked.select("qid", "nbr_rank", "neighbor_id", "dist")
