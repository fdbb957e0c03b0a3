"""Binary quantization (BQ) KNN — 1-bit-per-dimension codes with a
Hamming-distance shortlist and exact rerank (the 32×-compression end of
the quantization family: BQ 1-bit → SQ8 8-bit → PQ/OPQ sub-byte →
IVF-PQ; cf. FAISS ``IndexBinaryFlat`` serving and the sign-bit sketch
behind SimHash).

Build: per-dimension thresholds are the MIDRANGE (min+max)/2 from the
same one-scan min/max fit SQ8 uses — midrange (unlike a mean or a
median) is exact integer-free arithmetic on exact extrema, so codes are
bit-identical across engines and the DuckDB oracle replays the whole
pipeline with no literals. Encode: sign bits (x ≥ thr) packed 32 per
64-bit word. Search: XOR + popcount over the packed words (the scan
reads ~d/8 bytes per row), Hamming top-``shortlist`` per query (integer
distances — exact tie semantics), then the shared exact rerank re-scores
the shortlist with true L2.

At 100 TB the Hamming scan touches 1/32 of the raw float bytes and the
rerank joins only shortlist·n_q true vectors — the classic
cheap-filter-then-exact plan, with every stage a bounded Arrow batch.
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
from vectordbindexing_spark.operators.sq import sq8_fit
from vectordbindexing_spark.operators.topk import (
    batch_topk_by_dist_id,
    topk_per_group,
)

_BITS_PER_WORD = 32  # 32 bits per int64 word keeps every value positive
# and < 2^32 — safe in BIGINT arithmetic on both engines (bit 63 of a
# packed int64 would flip the sign in SQL)

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount(a: np.ndarray) -> np.ndarray:
    """Vectorized popcount via a byte LUT (numpy < 2.0 has no
    bitwise_count). Works on any integer dtype, summing per element."""
    b = np.ascontiguousarray(a)
    return (
        _POP[b.view(np.uint8)]
        .reshape(*b.shape, b.dtype.itemsize)
        .sum(axis=-1, dtype=np.int64)
    )


def bq_encode_np(X: np.ndarray, thr: np.ndarray) -> np.ndarray:
    """(n, nwords) int64 packed sign bits: bit i of word w is
    (x[w*32+i] >= thr[w*32+i]). The exact expression the oracle
    evaluates — exact comparisons on exact doubles, no rounding."""
    n, d = X.shape
    nwords = -(-d // _BITS_PER_WORD)
    bits = (X >= thr[None, :]).astype(np.int64)
    out = np.zeros((n, nwords), dtype=np.int64)
    for w in range(nwords):
        chunk = bits[:, w * _BITS_PER_WORD : (w + 1) * _BITS_PER_WORD]
        out[:, w] = (chunk << np.arange(chunk.shape[1], dtype=np.int64)).sum(
            axis=1
        )
    return out


def bq_encode(
    df: DataFrame,
    thr: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, words array<long>) — one broadcast pass; ~d/8 bytes/row."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(thr)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bthr = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            yield pd.DataFrame(
                {"id": pdf["i"].to_numpy(), "words": list(bq_encode_np(X, bthr))}
            )

    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("i"), F.col(vec_col).alias("v")
        )
        .mapInPandas(encode, schema="id long, words array<long>")
    )


def bq_knn(
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    q_id: str = "qid",
    q_vec: str = "vec",
    b_id: str = "id",
    b_vec: str = "vec",
    thresholds: np.ndarray | None = None,
) -> DataFrame:
    """BQ KNN: midrange thresholds, packed sign-bit encode, Hamming
    top-``shortlist`` scan, exact-L2 rerank to ``k``.

    Output (qid, nbr_rank, neighbor_id, dist) with ``dist`` the TRUE L2
    of the reranked shortlist — BQ is a filter, not a metric, so unlike
    SQ/PQ the coarse distance never leaves the operator."""
    base = base.select(
        F.col(b_id).cast("long").alias(b_id), F.col(b_vec).alias(b_vec)
    ).localCheckpoint(eager=True)  # consumed by fit + encode + rerank
    if thresholds is None:
        mins, maxs = sq8_fit(base, b_vec)
        thresholds = (mins + maxs) / 2.0
    enc = bq_encode(base, thresholds, b_id, b_vec)

    spark = queries.sparkSession
    qsel = queries.filter(F.col(q_vec).isNotNull()).select(
        F.col(q_id).cast("long").alias("qid"), F.col(q_vec).alias("v")
    )
    qrows = qsel.limit(_BLOCKED_THRESHOLD_QUERIES + 1).toPandas()
    if len(qrows) > _BLOCKED_THRESHOLD_QUERIES:
        raise ValueError(
            f"bq_knn broadcasts the query codes; got > "
            f"{_BLOCKED_THRESHOLD_QUERIES} queries — shard the query set"
        )
    qids = qrows["qid"].to_numpy()
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qrows["v"]])
    qcodes = bq_encode_np(Q, thresholds)
    bc = spark.sparkContext.broadcast((qids, qcodes))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bqc = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            W = np.stack(
                [np.asarray(w, dtype=np.int64) for w in pdf["words"]]
            )
            bids = pdf["id"].to_numpy()
            kk = min(shortlist, len(bids))
            # query-block the (q_block × batch) Hamming matrix like the
            # SQ8/PQ scans — at the 100k-query cap an unblocked matrix
            # over a 10k-row batch is 8 GB per task
            q_block = max(1, _ADC_BLOCK_TARGET_BYTES // (len(bids) * 8))
            for q0 in range(0, len(bqids), q_block):
                q1 = min(q0 + q_block, len(bqids))
                # Hamming: XOR word-wise, popcount, sum words — integer
                # distances, so ties are constant; exact (dist, id)
                # selection is what keeps the kept/dropped tied rows
                # batch-position-independent (see batch_topk_by_dist_id;
                # an argpartition cut here flipped 113/500 oracle rows
                # at single-partition parallelism)
                D = np.zeros((q1 - q0, len(bids)), dtype=np.int64)
                for w in range(W.shape[1]):
                    D += _popcount(bqc[q0:q1, w : w + 1] ^ W[None, :, w])
                nbr, rows_d = batch_topk_by_dist_id(D, bids, kk)
                yield pd.DataFrame(
                    {
                        "qid": np.repeat(bqids[q0:q1], kk),
                        "neighbor_id": nbr.ravel(),
                        "dist": rows_d.ravel().astype(np.float64),
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
    qdf = qsel.select("qid", to_double_array("v").alias("_qv"))
    bv = base.select(
        F.col(b_id).cast("long").alias("neighbor_id"),
        to_double_array(b_vec).alias("_bv"),
    )
    return exact_rerank(ranked, qdf, bv, k)
