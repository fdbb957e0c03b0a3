"""Product quantization (PQ) approximate KNN — the memory-compressed
scale path for similarity search (north-star operator; complements IVF's
partition pruning and the graph index with an 8-bytes-per-vector code
scan; Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011).

Build: split the d dims into ``m`` contiguous subspaces and Lloyd-fit a
``ks``-entry codebook per subspace on a bounded deterministic sample
(driver-side numpy — same recipe as ivf.kmeans_fit: iteration count never
multiplies corpus scans). Encode: one distributed pass mapping every
vector to its m nearest sub-centroids (m bytes for ks ≤ 256 — a 64-dim
float64 corpus compresses 64×). Search: asymmetric distance computation
(ADC) — per query an (m, ks) lookup table of partial squared L2s, then a
code scan accumulating table entries; O(n·m) adds instead of O(n·d)
mults, and the scan reads ONLY the code column (the vector column is
never shuffled).

At 100 TB the codes table is the only thing the query fan-out touches:
~1/64 of the raw bytes, co-partitioned with ids, Arrow-batched through
the LUT kernel with per-batch partial top-k (no full distance matrix).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.vector import to_double_array
from vectordbindexing_spark.operators.topk import (
    batch_topk_by_dist_id,
    topk_per_group,
)

_FIT_SAMPLE_SIZE = 100_000
_BLOCKED_THRESHOLD_QUERIES = 100_000
# Per-task cap on the ADC distance-block allocation: the scan processes
# queries in blocks of ~this many bytes of (q_block × batch) float64 —
# without it 100k queries × an 8k-row Arrow batch is a ~6.5 GB matrix in
# EVERY task. 128 MB keeps tasks comfortably inside executor memory while
# staying BLAS-friendly.
_ADC_BLOCK_TARGET_BYTES = 128 * 1024 * 1024


def _elementwise_d2(S: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, ks) squared L2 by ELEMENTWISE (x-c)² per pair — the exact
    arithmetic the DuckDB oracles replay via list_transform (the
    ||x||²-2x·c+||c||² expansion rounds differently and can flip argmin
    near-ties). Filled one centroid at a time: bit-identical to the
    (n, ks, dsub) broadcast form (same per-pair reduce order) at ~7×
    the speed and O(n·dsub) temporaries instead of an n·ks·dsub cube."""
    d2 = np.empty((len(S), len(C)), dtype=np.float64)
    for cid in range(len(C)):
        d2[:, cid] = ((S - C[cid]) ** 2).sum(axis=1)
    return d2


def pq_fit_arrays(
    ids: np.ndarray, X: np.ndarray, m: int, ks: int, max_iter: int = 5
) -> np.ndarray:
    """Per-subspace Lloyd k-means, pure numpy. Returns (m, ks, d//m)
    float64 codebooks. Deterministic and engine-independent: rows are
    canonicalized to id order HERE (S[mask].mean() is summation-order
    dependent, so caller row order — hash-ordered Spark sample vs
    parquet-ordered oracle read — must not reach the fit), init = the
    sub-vectors of the ``ks`` smallest ids, assignment ties → lowest
    centroid index (np.argmin), empty clusters keep their old centroid —
    the exact convention the DuckDB oracle replays from literals.
    Shared by pq_fit (Spark sample) and oracles.pq_knn_sql (same arrays).

    Requires unique ids: with duplicates, rows sharing an id keep
    caller-dependent relative order after the stable sort and the
    canonicalization guarantee would silently fail.
    """
    if np.unique(ids).size != ids.size:
        raise ValueError("pq_fit_arrays requires unique ids")
    order = np.argsort(ids, kind="stable")
    ids, X = ids[order], X[order]
    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    # rows are id-sorted above, so init = the first ks rows
    init_rows = np.arange(min(ks, n))
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[init_rows].copy()
        for _ in range(max_iter):
            # expansion-form d² (BLAS matmul) for the ASSIGNMENT only —
            # the fit's internals never reach SQL (the fitted codebooks
            # embed as literals computed by this same function on both
            # sides), so unlike encode/LUT below there is no elementwise
            # convention to honor; ivf.kmeans_fit set the precedent.
            # ~30× over the elementwise cube at the 100k sample
            # (measured 126 s → BLAS seconds for m=16, ks=256).
            d2 = (
                np.sum(S * S, axis=1)[:, None]
                - 2.0 * (S @ C.T)
                + np.sum(C * C, axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            newC = C.copy()
            # group rows by cell via stable argsort + contiguous slices:
            # each slice holds exactly the rows S[a == cid] in original
            # order, so the pairwise .mean is bit-identical to the
            # per-mask form while replacing ks boolean scans of S with
            # one argsort
            order2 = np.argsort(a, kind="stable")
            S_s = S[order2]
            bounds = np.searchsorted(a[order2], np.arange(ks + 1))
            for cid in range(ks):
                lo, hi = bounds[cid], bounds[cid + 1]
                if hi > lo:
                    newC[cid] = S_s[lo:hi].mean(axis=0)
            if np.allclose(newC, C, atol=1e-12):
                C = newC
                break
            C = newC
        books[j] = C
    return books


def pq_fit(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    max_iter: int = 5,
    id_col: str = "id",
    vec_col: str = "vec",
    sample_size: int = _FIT_SAMPLE_SIZE,
) -> np.ndarray:
    """Fit PQ codebooks on a bounded deterministic sample (hash-ordered
    take via plans.partitioning.hash_ordered_sample — one scan, driver
    transfer bounded at ~1.3×sample_size rows; below ``sample_size``
    rows the sample IS the corpus, which is what makes the sf-scale
    oracle exact)."""
    from vectordbindexing_spark.plans.partitioning import (
        hash_ordered_sample,
    )

    rows = hash_ordered_sample(df, sample_size, id_col, vec_col)
    ids = rows["i"].to_numpy()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in rows["v"]])
    return pq_fit_arrays(ids, X, m, ks, max_iter)


def encode_codes_np(X: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) nearest-codeword indices per sub-vector (ties → lowest
    code, the np.argmin convention the oracle mirrors). Shared by
    pq_encode and the fused IVF-PQ encode+assign pass."""
    m, ks, dsub = codebooks.shape
    codes = np.empty((len(X), m), dtype=np.int64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        codes[:, j] = np.argmin(_elementwise_d2(S, codebooks[j]), axis=1)
    return codes


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, codes array<int>) — one broadcast-codebook Arrow pass."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            yield pd.DataFrame(
                {"id": pdf["i"].to_numpy(), "codes": list(encode_codes_np(X, B))}
            )

    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).cast("long").alias("i"), F.col(vec_col).alias("v")
    ).mapInPandas(encode, schema="id long, codes array<long>")


def exact_rerank(
    shortlist: DataFrame, qdf: DataFrame, bv: DataFrame, k: int
) -> DataFrame:
    """Exact root-L2 re-score of an ADC shortlist — the second stage of
    the classic two-stage serving plan (compressed scan everywhere, true
    vectors touched only for shortlist·n_q rows). ``qdf`` is (qid, _qv),
    ``bv`` is (neighbor_id, _bv); output (qid, nbr_rank, neighbor_id,
    dist) where ``dist`` is ROOT L2 (pair_dist_udf('l2') takes the
    sqrt) — callers rescaling to another metric must square first.
    Shared by pq_knn and ivfpq_knn so both reranks stay
    convention-identical (ties → neighbor_id)."""
    from vectordbindexing_spark.functions.vector import pair_dist_udf

    rescored = (
        shortlist.select("qid", "neighbor_id")
        .join(bv, "neighbor_id")
        .join(qdf, "qid")
        .withColumn("dist", pair_dist_udf("l2")("_qv", "_bv"))
    )
    final = topk_per_group(
        rescored.select("qid", "neighbor_id", "dist"),
        ["qid"], "dist", k, tie_col="neighbor_id",
    )
    return final.select("qid", "nbr_rank", "neighbor_id", "dist")


def pq_knn(
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    max_iter: int = 5,
    q_id: str = "qid",
    q_vec: str = "vec",
    b_id: str = "id",
    b_vec: str = "vec",
    codebooks: np.ndarray | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """PQ-ADC approximate KNN: fit (or reuse) codebooks, encode the base,
    scan codes with per-query lookup tables, per-query top-k.

    Output (qid, nbr_rank, neighbor_id, dist); ``dist`` is the ADC
    approximation of squared L2 (vectors sharing codes tie exactly and
    break by neighbor_id — deterministic in both engines). With
    ``rerank=R`` the ADC shortlist of R candidates is re-scored with exact
    squared L2 against the true vectors (the standard two-stage serving
    plan: compressed scan everywhere, full vectors touched only for
    R·n_q rows).
    """
    base = base.select(
        F.col(b_id).cast("long").alias(b_id), F.col(b_vec).alias(b_vec)
    ).localCheckpoint(eager=True)  # consumed by fit + encode (+ rerank)
    if codebooks is None:
        codebooks = pq_fit(base, m, ks, max_iter, b_id, b_vec)
    m, ks, dsub = codebooks.shape
    enc = pq_encode(base, codebooks, b_id, b_vec)

    spark = queries.sparkSession
    qsel = queries.filter(F.col(q_vec).isNotNull()).select(
        F.col(q_id).cast("long").alias("qid"), F.col(q_vec).alias("v")
    )
    # bounded collect probe (same contract as _exact_knn_blocked): N+1
    # rows back == "query side too big to broadcast"
    qrows = qsel.limit(_BLOCKED_THRESHOLD_QUERIES + 1).toPandas()
    if len(qrows) > _BLOCKED_THRESHOLD_QUERIES:
        raise ValueError(
            f"pq_knn broadcasts the query-side LUTs; got > "
            f"{_BLOCKED_THRESHOLD_QUERIES} queries — shard the query set "
            f"(queries are embarrassingly parallel across batches)"
        )
    qids = qrows["qid"].to_numpy()
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qrows["v"]])
    # (n_q, m, ks) partial squared-L2 tables
    luts = np.empty((len(Q), m, ks), dtype=np.float64)
    for j in range(m):
        qs = Q[:, j * dsub : (j + 1) * dsub]
        luts[:, j, :] = _elementwise_d2(qs, codebooks[j])
    bc = spark.sparkContext.broadcast((qids, luts))
    shortlist = k if rerank is None else max(k, rerank)

    def adc_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, blut = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )
            bids = pdf["id"].to_numpy()
            kk = min(shortlist, len(bids))
            # process queries in blocks so the dense (q_block × batch)
            # distance matrix stays under _ADC_BLOCK_TARGET_BYTES per
            # task; per-query results are independent, so blocking
            # changes nothing about the output
            q_block = max(1, _ADC_BLOCK_TARGET_BYTES // (len(bids) * 8))
            for q0 in range(0, len(bqids), q_block):
                q1 = min(q0 + q_block, len(bqids))
                # sequential j-order accumulation — the same summation
                # order as the oracle's ordered list_sum, so equal-code
                # rows tie bit-exactly in both engines
                D = np.zeros((q1 - q0, len(bids)), dtype=np.float64)
                for j in range(blut.shape[1]):
                    D += blut[q0:q1, j, :][:, codes[:, j]]
                # exact (dist, id) selection: rows sharing codes tie
                # bit-exactly, so an argpartition cut at the boundary
                # would keep/drop tied rows by batch position, not the
                # lowest-id convention the merge window and oracle use
                nbr, rows_d = batch_topk_by_dist_id(D, bids, kk)
                yield pd.DataFrame(
                    {
                        "qid": np.repeat(bqids[q0:q1], kk),
                        "neighbor_id": nbr.ravel(),
                        "dist": rows_d.ravel(),
                    }
                )

    from vectordbindexing_spark.plans.partitioning import repartition_for_compute

    partial = repartition_for_compute(enc).mapInPandas(
        adc_scan, schema="qid long, neighbor_id long, dist double"
    )
    ranked = topk_per_group(
        partial, ["qid"], "dist", shortlist, tie_col="neighbor_id"
    )
    if rerank is None:
        return ranked.select("qid", "nbr_rank", "neighbor_id", "dist")
    # exact re-score of the shortlist: one equi-join against the true
    # vectors (R·n_q rows — never the full corpus), then final top-k
    qdf = qsel.select("qid", to_double_array("v").alias("_qv"))
    bv = base.select(
        F.col(b_id).cast("long").alias("neighbor_id"),
        to_double_array(b_vec).alias("_bv"),
    )
    return exact_rerank(ranked, qdf, bv, k)
