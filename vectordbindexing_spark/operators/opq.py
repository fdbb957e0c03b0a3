"""Optimized Product Quantization (OPQ) — PQ behind a learned
orthogonal rotation (Ge et al., "Optimized Product Quantization for
Approximate Nearest Neighbor Search", CVPR 2013, non-parametric
variant). Plain PQ quantizes CONTIGUOUS dimension groups, so
cross-group correlation (ubiquitous in real embeddings) inflates
reconstruction error; OPQ alternates (1) PQ fit in the rotated space
with (2) an orthogonal-Procrustes update R = U·Vᵀ from
SVD(Xᵀ·decode(encode(X·R))), then serves exactly like PQ on rotated
vectors. Rotation is orthogonal, so L2 geometry (and the exact rerank)
is unchanged.

Spark shape: the fit is driver-side numpy on the same bounded
deterministic sample PQ uses (iteration count never multiplies corpus
scans); the rotation applies as ONE broadcast-matmul Arrow pass over
base and queries; everything downstream (encode, ADC scan, rerank)
delegates to operators.pq unchanged — at 100 TB the added cost over PQ
is one matmul per scanned batch.

The DuckDB oracle embeds R and the codebooks as literals (both
produced by the SAME opq_fit_arrays on the base split) and replays
rotation + encode + ADC in SQL. Rotated values differ from numpy's
BLAS matmul only in final-ulp summation order — absorbed by the
standard round-to-6, same status as the exact-KNN oracles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.pq import (
    _FIT_SAMPLE_SIZE,
    encode_codes_np,
    pq_fit_arrays,
    pq_knn,
)


def opq_decode_np(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Reconstruct (n, d) vectors from (n, m) codes — concatenated
    sub-centroids. Shared by the Procrustes update and tests."""
    m = codebooks.shape[0]
    return np.concatenate(
        [codebooks[j][codes[:, j]] for j in range(m)], axis=1
    )


def opq_fit_arrays(
    ids: np.ndarray,
    X: np.ndarray,
    m: int,
    ks: int,
    opq_iters: int = 5,
    pq_iters: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """Alternating OPQ-NP fit, pure numpy → (R (d,d), codebooks).

    Deterministic and engine-independent like pq_fit_arrays: rows are
    canonicalized to id order HERE (Xᵀ·Y and the k-means inherit
    summation order from row order), R starts at identity, each round
    re-fits PQ in the current rotation then solves the orthogonal
    Procrustes via SVD. ``opq_iters=0`` degenerates to exactly plain PQ
    (R = I, one pq_fit_arrays call) — the delegation pin the tests use.
    """
    if np.unique(ids).size != ids.size:
        raise ValueError("opq_fit_arrays requires unique ids")
    order = np.argsort(ids, kind="stable")
    ids, X = ids[order], X[order]
    d = X.shape[1]
    R = np.eye(d)
    for _ in range(opq_iters):
        Xr = X @ R
        books = pq_fit_arrays(ids, Xr, m, ks, pq_iters)
        Y = opq_decode_np(encode_codes_np(Xr, books), books)
        U, _, Vt = np.linalg.svd(X.T @ Y)
        R = U @ Vt
    books = pq_fit_arrays(ids, X @ R, m, ks, pq_iters)
    return R, books


def opq_fit(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    opq_iters: int = 5,
    pq_iters: int = 3,
    id_col: str = "id",
    vec_col: str = "vec",
    sample_size: int = _FIT_SAMPLE_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit (R, codebooks) on the same bounded deterministic sample
    recipe as pq_fit (hash_ordered_sample — one scan, bounded driver
    transfer)."""
    from vectordbindexing_spark.plans.partitioning import (
        hash_ordered_sample,
    )

    rows = hash_ordered_sample(df, sample_size, id_col, vec_col)
    ids = rows["i"].to_numpy()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in rows["v"]])
    return opq_fit_arrays(ids, X, m, ks, opq_iters, pq_iters)


def opq_rotate(
    df: DataFrame,
    R: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, vec) with vec ↦ vec·R — one broadcast-matmul Arrow pass."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(R)

    def rot(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bR = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            yield pd.DataFrame(
                {"id": pdf["i"].to_numpy(), "vec": list(X @ bR)}
            )

    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("i"), F.col(vec_col).alias("v")
        )
        .mapInPandas(rot, schema="id long, vec array<double>")
    )


def opq_knn(
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    opq_iters: int = 5,
    pq_iters: int = 3,
    q_id: str = "qid",
    q_vec: str = "vec",
    b_id: str = "id",
    b_vec: str = "vec",
    model: tuple[np.ndarray, np.ndarray] | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """OPQ approximate KNN: fit (or reuse) the rotation + codebooks,
    rotate both sides, delegate to the PQ ADC pipeline. Output
    (qid, nbr_rank, neighbor_id, dist) — same contract as pq_knn, with
    ``dist`` the ADC squared L2 in the rotated space (equal to
    unrotated squared L2 up to quantization, R being orthogonal)."""
    if model is None:
        model = opq_fit(
            base, m, ks, opq_iters, pq_iters, b_id, b_vec
        )
    R, books = model
    brot = opq_rotate(base, R, b_id, b_vec)
    qrot = opq_rotate(queries, R, q_id, q_vec)
    return pq_knn(
        qrot, brot, k=k,
        q_id="id", q_vec="vec", b_id="id", b_vec="vec",
        codebooks=books, rerank=rerank,
    )
