"""Scalar quantization (SQ8) approximate KNN — the 4× memory-compressed
scan between raw floats and PQ's 64× codes (north-star operator; the
FAISS ``IndexScalarQuantizer``-style rung of the ANN ladder: exact →
SQ8 → IVF → PQ → IVF-PQ → graph).

Build: one distributed pass computes per-dimension (min, max) over the
base corpus (per-Arrow-batch numpy partials, then a d-row reduce — the
shuffle is dims × batches rows, not the corpus). Encode: one broadcast
pass maps each vector to d uint8 codes via the affine transform
``code = clip(floor((x - min) * 255/(max-min) + 0.5), 0, 255)``.
Search: asymmetric — queries stay float; each code batch decodes to
``min + code * (max-min)/255`` and scores with the same expanded
squared-L2 the exact kernel uses, partial top-k per batch.

Unlike PQ there is no trained codebook, so the DuckDB oracle REPLAYS
THE WHOLE PIPELINE from the raw table — per-dim min/max, the encode
transform, decode, distance — making the contract query
algorithm-independent truth, not a twin pin. The fit/encode/decode
arithmetic is the same IEEE expression tree in both engines, so codes
and decoded vectors match bit-exactly; only the inner-product
summation order differs (numpy pairwise vs sequential), absorbed by
the standard round-to-6 on the output distance.

At 100 TB: the scan touches only the codes column (1 byte/dim at rest
vs 4-byte floats), the fit is one corpus scan with map-side reduction,
and queries broadcast (bounded probe, same contract as exact/PQ).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.vector import to_double_array
from vectordbindexing_spark.operators.pq import (
    _ADC_BLOCK_TARGET_BYTES,
    _BLOCKED_THRESHOLD_QUERIES,
    exact_rerank,
)
from vectordbindexing_spark.operators.topk import (
    batch_topk_by_dist_id,
    topk_per_group,
)


def sq8_fit(
    df: DataFrame, vec_col: str = "vec"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (mins, maxs) float64 over the non-null vectors —
    one scan, numpy partials per Arrow batch, d-row shuffle."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            yield pd.DataFrame(
                {
                    "pos": np.arange(X.shape[1], dtype=np.int64),
                    "mn": X.min(axis=0),
                    "mx": X.max(axis=0),
                }
            )

    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).alias("v"))
        .mapInPandas(partial, schema="pos long, mn double, mx double")
        .groupBy("pos")
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .orderBy("pos")
        .collect()
    )
    if not rows:
        raise ValueError("sq8_fit: no non-null vectors")
    mins = np.array([r["mn"] for r in rows], dtype=np.float64)
    maxs = np.array([r["mx"] for r in rows], dtype=np.float64)
    return mins, maxs


def _sq8_params(mins: np.ndarray, maxs: np.ndarray):
    """(scales, invs): encode multiplier 255/(max-min) and decode step
    (max-min)/255; constant dims get 0 for both (code 0, decode = min)."""
    span = maxs - mins
    ok = span > 0
    scales = np.where(ok, 255.0 / np.where(ok, span, 1.0), 0.0)
    invs = np.where(ok, span / 255.0, 0.0)
    return scales, invs


def sq8_encode_np(X: np.ndarray, mins: np.ndarray, scales: np.ndarray):
    """clip(floor((x-min)*scale + 0.5), 0, 255) — the exact expression
    the DuckDB oracle evaluates per element, so codes match bit-exactly
    (identical IEEE op sequence on identical doubles)."""
    u = (X - mins[None, :]) * scales[None, :]
    return np.clip(np.floor(u + 0.5), 0.0, 255.0).astype(np.int64)


def sq8_decode_np(codes: np.ndarray, mins: np.ndarray, invs: np.ndarray):
    """min + code * step, same expression tree as the oracle's decode."""
    return mins[None, :] + codes.astype(np.float64) * invs[None, :]


def sq8_encode(
    df: DataFrame,
    mins: np.ndarray,
    maxs: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, codes array<long> of uint8 values) — one broadcast pass.
    At rest the codes column parquet-encodes to ~1 byte/dim (values
    0..255 → byte-packed ints), 4× under float32 embeddings."""
    spark = df.sparkSession
    scales, _ = _sq8_params(mins, maxs)
    bc = spark.sparkContext.broadcast((mins, scales))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bmins, bscales = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            codes = sq8_encode_np(X, bmins, bscales)
            yield pd.DataFrame(
                {"id": pdf["i"].to_numpy(), "codes": list(codes)}
            )

    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("i"), F.col(vec_col).alias("v")
        )
        .mapInPandas(encode, schema="id long, codes array<long>")
    )


def sq8_knn(
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    q_id: str = "qid",
    q_vec: str = "vec",
    b_id: str = "id",
    b_vec: str = "vec",
    params: tuple[np.ndarray, np.ndarray] | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """SQ8 asymmetric KNN: fit (or reuse) per-dim ranges, encode the
    base, scan codes decoding per batch, per-query top-k by L2.

    Output (qid, nbr_rank, neighbor_id, dist); ``dist`` is L2 between
    the float query and the DEQUANTIZED base vector (ties →
    neighbor_id). With ``rerank=R`` the shortlist re-scores with exact
    L2 against true vectors via the shared two-stage rerank."""
    base = base.select(
        F.col(b_id).cast("long").alias(b_id), F.col(b_vec).alias(b_vec)
    ).localCheckpoint(eager=True)  # consumed by fit + encode (+ rerank)
    if params is None:
        params = sq8_fit(base, b_vec)
    mins, maxs = params
    _, invs = _sq8_params(mins, maxs)
    enc = sq8_encode(base, mins, maxs, b_id, b_vec)

    spark = queries.sparkSession
    qsel = queries.filter(F.col(q_vec).isNotNull()).select(
        F.col(q_id).cast("long").alias("qid"), F.col(q_vec).alias("v")
    )
    qrows = qsel.limit(_BLOCKED_THRESHOLD_QUERIES + 1).toPandas()
    if len(qrows) > _BLOCKED_THRESHOLD_QUERIES:
        raise ValueError(
            f"sq8_knn broadcasts the query block; got > "
            f"{_BLOCKED_THRESHOLD_QUERIES} queries — shard the query set "
            f"(queries are embarrassingly parallel across batches)"
        )
    qids = qrows["qid"].to_numpy()
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qrows["v"]])
    q2 = (Q * Q).sum(axis=1)
    bc = spark.sparkContext.broadcast((qids, Q, q2, mins, invs))
    shortlist = k if rerank is None else max(k, rerank)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bQ, bq2, bmins, binvs = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )
            bids = pdf["id"].to_numpy()
            dec = sq8_decode_np(codes, bmins, binvs)
            d2b = (dec * dec).sum(axis=1)
            kk = min(shortlist, len(bids))
            # block queries so the dense (q_block × batch) matrix stays
            # bounded per task (same contract as the PQ ADC scan)
            q_block = max(1, _ADC_BLOCK_TARGET_BYTES // (len(bids) * 8))
            for q0 in range(0, len(bqids), q_block):
                q1 = min(q0 + q_block, len(bqids))
                # expanded form matches the exact-KNN l2 oracle
                D = (
                    bq2[q0:q1, None]
                    + d2b[None, :]
                    - 2.0 * (bQ[q0:q1] @ dec.T)
                )
                np.sqrt(np.maximum(D, 0.0, out=D), out=D)
                # exact (dist, id) selection: distinct rows can share
                # 8-bit codes and tie bit-exactly on decoded distance —
                # see batch_topk_by_dist_id for the boundary hazard
                nbr, rows_d = batch_topk_by_dist_id(D, bids, kk)
                yield pd.DataFrame(
                    {
                        "qid": np.repeat(bqids[q0:q1], kk),
                        "neighbor_id": nbr.ravel(),
                        "dist": rows_d.ravel(),
                    }
                )

    from vectordbindexing_spark.plans.partitioning import (
        repartition_for_compute,
    )

    partial = repartition_for_compute(enc).mapInPandas(
        scan, schema="qid long, neighbor_id long, dist double"
    )
    ranked = topk_per_group(
        partial, ["qid"], "dist", shortlist, tie_col="neighbor_id"
    )
    if rerank is None:
        return ranked.select("qid", "nbr_rank", "neighbor_id", "dist")
    qdf = qsel.select("qid", to_double_array("v").alias("_qv"))
    bv = base.select(
        F.col(b_id).cast("long").alias("neighbor_id"),
        to_double_array(b_vec).alias("_bv"),
    )
    return exact_rerank(ranked, qdf, bv, k)
