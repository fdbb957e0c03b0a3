"""IVF-PQ composite index — the classic 100 TB ANN serving plan
(Jégou et al., TPAMI 2011: inverted file + asymmetric distance
computation): a coarse k-means quantizer prunes the corpus to
``nprobe``/``nlist`` of its cells, and within the probed cells distances
are computed against m-byte PQ codes instead of raw vectors.

Composition of the two existing scale primitives with their oracle
conventions intact:

- coarse quantizer = ivf.kmeans_fit fit + the ivf_assign convention
  (expansion-formula d², ties → lowest cid),
- codes = pq.pq_fit fit + the pq_encode convention (elementwise d²,
  ties → lowest code) — assignment and encoding run FUSED in one Arrow
  pass (ivfpq_encode_assign), so the index build never joins,
- scan = the PQ ADC lookup-table kernel, restricted per batch to the
  rows whose cell some query probes.

Physical plan: ONE distributed pass over the (cid, id, codes) table —
the query LUTs and probe sets are broadcast, each Arrow batch groups its
rows by cell and scores only (queries probing that cell) × (rows of that
cell) sub-matrices, with per-batch partial top-k. Nothing about the
query fan-out shuffles; candidate volume is n·nprobe/nlist·(m bytes),
~1/64·nprobe/nlist of the raw corpus bytes.

With ``nprobe == nlist`` the cell filter admits everything and the
result is IDENTICAL to the plain PQ ADC scan (pinned by test) — pruning
and compression are orthogonal by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.ivf import _argmin_d2_blocked, kmeans_fit
from vectordbindexing_spark.operators.pq import (
    _ADC_BLOCK_TARGET_BYTES,
    _BLOCKED_THRESHOLD_QUERIES,
    _elementwise_d2,
    encode_codes_np,
    pq_fit,
)
from vectordbindexing_spark.operators.topk import (
    batch_topk_by_dist_id,
    topk_per_group,
)
from vectordbindexing_spark.plans.partitioning import local_rows_df


def ivfpq_encode_assign(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    b_id: str = "id",
    b_vec: str = "vec",
) -> DataFrame:
    """(cid, id, codes) in ONE broadcast Arrow pass. Cell assignment and
    PQ encoding are both per-row functions of the same vector, so fusing
    them removes the pq_encode ⨝ ivf_assign equi-join that shuffled the
    full codes table just to glue two columns computed from the same
    batch — at 100 TB that join was the only corpus-sized shuffle in the
    index build. Conventions unchanged: assignment ties → lowest cid
    (_argmin_d2_blocked), code ties → lowest code (encode_codes_np)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((centroids, codebooks))

    def both(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C, B = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            yield pd.DataFrame(
                {
                    "cid": _argmin_d2_blocked(X, C),
                    "id": pdf["i"].to_numpy(),
                    "codes": list(encode_codes_np(X, B)),
                }
            )

    return df.filter(F.col(b_vec).isNotNull()).select(
        F.col(b_id).cast("long").alias("i"), F.col(b_vec).alias("v")
    ).mapInPandas(both, schema="cid long, id long, codes array<long>")


def _collect_queries(queries: DataFrame, q_id: str, q_vec: str):
    """Bounded query collect (same broadcast contract as pq_knn)."""
    qsel = queries.filter(F.col(q_vec).isNotNull()).select(
        F.col(q_id).cast("long").alias("qid"), F.col(q_vec).alias("v")
    )
    qrows = qsel.limit(_BLOCKED_THRESHOLD_QUERIES + 1).toPandas()
    if len(qrows) > _BLOCKED_THRESHOLD_QUERIES:
        raise ValueError(
            f"IVF-PQ search broadcasts query LUTs + probe sets; got > "
            f"{_BLOCKED_THRESHOLD_QUERIES} queries - shard the query set"
        )
    qids = qrows["qid"].to_numpy()
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qrows["v"]])
    return qids, Q


def _probes_and_luts(Q, centroids: np.ndarray, codebooks: np.ndarray,
                     nprobe: int):
    """(cell -> query positions probing it, (n_q, m, ks) ADC tables).

    Probe selection uses the same expansion-formula d² as ivf_assign with
    lowest-cid ties; LUT arithmetic is identical to pq_knn. Both loops
    run in bounded query blocks so the scratch allocations stay under
    ``_ADC_BLOCK_TARGET_BYTES`` regardless of n_q × nlist — at the
    planner's 100 TB sizing (nlist ≈ 2.5k, 100k queries) the old dense
    matrix was n_q·nlist·8 bytes on the driver; blocking makes it
    q_block·nlist·8. A per-row stable argsort replaces the per-query
    Python lexsort loop: ``argsort(d2_row, kind="stable")`` sorts by d²
    ascending with ties broken by column position, i.e. lowest cid —
    exactly ``lexsort((arange(nlist), d2_row))``, but vectorized over the
    whole block. (argpartition would be O(nlist) per row but cannot honor
    the tie convention when the cut lands inside a tie group.)"""
    m, ks, dsub = codebooks.shape
    nlist = len(centroids)
    nprobe = min(nprobe, nlist)
    n_q = len(Q)
    c_sq = np.sum(centroids * centroids, axis=1)[None, :]
    probe_cids = np.empty((n_q, nprobe), dtype=np.int64)
    q_block = max(1, _ADC_BLOCK_TARGET_BYTES // (max(nlist, 1) * 8))
    for q0 in range(0, n_q, q_block):
        q1 = min(q0 + q_block, n_q)
        qb = Q[q0:q1]
        d2 = np.sum(qb * qb, axis=1)[:, None] - 2 * qb @ centroids.T + c_sq
        probe_cids[q0:q1] = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
    # invert to cell -> sorted query positions: one stable sort of the
    # flat (cid, qpos) pairs instead of a per-unique-cid matrix scan
    flat_c = probe_cids.ravel()
    flat_q = np.repeat(np.arange(n_q, dtype=np.int64), nprobe)
    order = np.argsort(flat_c, kind="stable")  # stable keeps qpos ascending
    sc, sq = flat_c[order], flat_q[order]
    starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
    ends = np.r_[starts[1:], len(sc)]
    probes_of = {int(sc[s]): sq[s:e] for s, e in zip(starts, ends)}
    luts = np.empty((n_q, m, ks), dtype=np.float64)
    lut_block = max(1, _ADC_BLOCK_TARGET_BYTES // (max(ks * dsub, 1) * 8))
    for q0 in range(0, n_q, lut_block):
        q1 = min(q0 + lut_block, n_q)
        for j in range(m):
            qs = Q[q0:q1, j * dsub : (j + 1) * dsub]
            luts[q0:q1, j, :] = _elementwise_d2(qs, codebooks[j])
    return probes_of, luts


def _adc_probe_topk(inv: DataFrame, qids, luts, probes_of, k: int) -> DataFrame:
    """One pass over (cid, id, codes): per batch, group rows by cell and
    ADC-score only (queries probing the cell) x (cell rows) sub-matrices
    in memory-bounded query blocks (sequential j-order sums - the oracle
    summation order), partial top-k per block, global window merge."""
    spark = inv.sparkSession
    bc = spark.sparkContext.broadcast((qids, luts, probes_of))

    def adc_probe_scan(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        bqids, blut, bprobes = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )
            bids = pdf["id"].to_numpy()
            cids = pdf["cid"].to_numpy()
            for cid in np.unique(cids):
                qpos = bprobes.get(int(cid))
                if qpos is None:
                    continue
                rows = np.flatnonzero(cids == cid)
                sub_codes, sub_ids = codes[rows], bids[rows]
                kk = min(k, len(sub_ids))
                q_block = max(
                    1, _ADC_BLOCK_TARGET_BYTES // (max(len(sub_ids), 1) * 8)
                )
                for q0 in range(0, len(qpos), q_block):
                    qs = qpos[q0 : q0 + q_block]
                    D = np.zeros((len(qs), len(sub_ids)), dtype=np.float64)
                    for j in range(blut.shape[1]):
                        D += blut[qs, j, :][:, sub_codes[:, j]]
                    # exact (dist, id) selection — equal-code rows tie
                    # bit-exactly; see batch_topk_by_dist_id
                    nbr, rows_d = batch_topk_by_dist_id(D, sub_ids, kk)
                    yield pd.DataFrame(
                        {
                            "qid": np.repeat(bqids[qs], kk),
                            "neighbor_id": nbr.ravel(),
                            "dist": rows_d.ravel(),
                        }
                    )

    from vectordbindexing_spark.plans.partitioning import repartition_for_compute

    partial = repartition_for_compute(inv).mapInPandas(
        adc_probe_scan, schema="qid long, neighbor_id long, dist double"
    )
    ranked = topk_per_group(partial, ["qid"], "dist", k, tie_col="neighbor_id")
    return ranked.select("qid", "nbr_rank", "neighbor_id", "dist")


def ivfpq_knn(
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ks: int = 16,
    max_iter: int = 3,
    q_id: str = "qid",
    q_vec: str = "vec",
    b_id: str = "id",
    b_vec: str = "vec",
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    rerank: int | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate KNN. Output (qid, nbr_rank, neighbor_id, dist);
    ``dist`` is the ADC squared-L2 approximation (ties → neighbor_id,
    deterministic in both engines). With ``rerank=R`` the ADC shortlist of
    R candidates per query is re-scored with exact ROOT L2 against the
    true vectors (shared :func:`operators.pq.exact_rerank` stage — note
    the metric change: reranked dist is √L2, not squared) — the
    reference-grade two-stage plan: compressed probe scan everywhere,
    full-width vectors touched only for R·n_q rows.

    ``allowed`` (a DataFrame with an ``id`` column) restricts search to a
    metadata-filtered subset — filtered ANN. The restriction is a LEFT
    SEMI join on the codes table BEFORE the ADC kernel, so the scan
    prunes to allowed∩probed rows and, because cell assignment and codes
    are per-row, results are identical to building the index over the
    pre-filtered base with the same quantizers (pinned by test). Top-k
    is computed after the restriction — a query whose neighborhood is
    filtered away still returns its k best allowed rows."""
    base = base.select(
        F.col(b_id).cast("long").alias(b_id), F.col(b_vec).alias(b_vec)
    ).localCheckpoint(eager=True)  # consumed by both fits + assign + encode
    if centroids is None:
        centroids = kmeans_fit(base, nlist, max_iter, b_id, b_vec)
    if codebooks is None:
        codebooks = pq_fit(base, m, ks, max_iter, b_id, b_vec)
    m, ks, dsub = codebooks.shape
    inv = ivfpq_encode_assign(base, centroids, codebooks, b_id, b_vec)
    if allowed is not None:
        inv = inv.join(
            allowed.select(F.col("id").cast("long").alias("id")), "id", "semi"
        )

    qids, Q = _collect_queries(queries, q_id, q_vec)
    probes_of, luts = _probes_and_luts(Q, centroids, codebooks, nprobe)
    shortlist = k if rerank is None else max(k, rerank)
    ranked = _adc_probe_topk(inv, qids, luts, probes_of, shortlist)
    if rerank is None:
        return ranked
    return _rerank_against(ranked, queries, base, k, q_id, q_vec, b_id, b_vec)


def _rerank_against(
    ranked: DataFrame,
    queries: DataFrame,
    base: DataFrame,
    k: int,
    q_id: str,
    q_vec: str,
    b_id: str,
    b_vec: str,
) -> DataFrame:
    from vectordbindexing_spark.functions.vector import to_double_array
    from vectordbindexing_spark.operators.pq import exact_rerank

    qdf = queries.select(
        F.col(q_id).cast("long").alias("qid"),
        to_double_array(q_vec).alias("_qv"),
    )
    bv = base.select(
        F.col(b_id).cast("long").alias("neighbor_id"),
        to_double_array(b_vec).alias("_bv"),
    )
    return exact_rerank(ranked, qdf, bv, k)


def save_ivfpq_index(
    base: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    b_id: str = "id",
    b_vec: str = "vec",
) -> None:
    """Persist the IVF-PQ artifact:

    - ``path/codes`` — (cid, id, codes) written ``partitionBy("cid")``,
      so serving's parquet scan partition-prunes to the probed cells,
    - ``path/centroids`` / ``path/codebooks`` — the two fitted arrays.

    One fused encode+assign scan at build time (no join); thereafter every
    query batch reads nprobe/nlist of an already-64×-compressed table —
    the artifact for 100 TB corpora is ~nprobe/nlist · raw/64 bytes per
    search.
    """
    spark = base.sparkSession
    inv = ivfpq_encode_assign(base, centroids, codebooks, b_id, b_vec)
    inv.write.mode("overwrite").partitionBy("cid").parquet(f"{path}/codes")
    m, ks, dsub = codebooks.shape
    # centroids/codebooks/meta are driver-resident metadata (O(nlist·d) +
    # O(m·ks·dsub) floats — KBs to a few MB even at planner-scale nlist),
    # so they go through pyarrow directly instead of three Spark jobs
    # whose scheduler + commit-protocol overhead dwarfs the bytes. Only
    # the codes table — the data-scale part — is a distributed write.
    if not _metadata_local(spark, path):  # non-local FS: Spark writer
        local_rows_df(
            spark,
            [
                (int(i), [float(x) for x in row])
                for i, row in enumerate(centroids)
            ],
            "cid long, cvec array<double>",
        ).write.mode("overwrite").parquet(f"{path}/centroids")
        flat = codebooks.reshape(m * ks, dsub)
        local_rows_df(
            spark,
            [(int(i), [float(x) for x in row]) for i, row in enumerate(flat)],
            "i long, row array<double>",
        ).write.mode("overwrite").parquet(f"{path}/codebooks")
        local_rows_df(
            spark, [(int(m), int(ks), int(dsub))],
            "m long, ks long, dsub long",
        ).write.mode("overwrite").parquet(f"{path}/meta")
        return
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    lpath = _strip_file_scheme(path)

    def _write(sub: str, table: pa.Table) -> None:
        os.makedirs(f"{lpath}/{sub}", exist_ok=True)
        papq.write_table(table, f"{lpath}/{sub}/part-00000.parquet")

    _write(
        "centroids",
        pa.table(
            {
                "cid": pa.array(range(len(centroids)), pa.int64()),
                "cvec": pa.array(
                    centroids.astype(np.float64).tolist(),
                    pa.list_(pa.float64()),
                ),
            }
        ),
    )
    flat = codebooks.reshape(m * ks, dsub)
    _write(
        "codebooks",
        pa.table(
            {
                "i": pa.array(range(len(flat)), pa.int64()),
                "row": pa.array(
                    flat.astype(np.float64).tolist(), pa.list_(pa.float64())
                ),
            }
        ),
    )
    _write(
        "meta",
        pa.table(
            {
                "m": pa.array([int(m)], pa.int64()),
                "ks": pa.array([int(ks)], pa.int64()),
                "dsub": pa.array([int(dsub)], pa.int64()),
            }
        ),
    )


def _strip_file_scheme(path: str) -> str:
    """'file:///x' / 'file:/x' → '/x' for the pyarrow/os calls (Spark
    accepts either form; pyarrow wants a plain local path)."""
    if path.startswith("file:"):
        rest = path[len("file:"):]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    return path


def _metadata_local(spark, path: str) -> bool:
    """True when ``path`` resolves to the driver's local filesystem for
    BOTH Spark and pyarrow — i.e. the artifact's codes (Spark writer)
    and metadata (pyarrow) land on the same filesystem. A scheme-less
    path resolves against Hadoop's fs.defaultFS, so on an HDFS-default
    cluster '/indexes/foo' is NOT local even though it has no scheme —
    writing metadata to the driver's disk there would split the artifact
    across filesystems."""
    if "://" in path:
        return path.startswith("file:")
    default_fs = (
        spark.sparkContext._jsc.hadoopConfiguration().get(
            "fs.defaultFS", "file:///"
        )
    )
    return default_fs.startswith("file:")


def load_ivfpq_arrays(spark, path: str) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, codebooks) back from the artifact. Paths on the local
    filesystem (per Hadoop fs.defaultFS resolution) read the three
    metadata tables with pyarrow on the driver (no Spark jobs); other
    filesystems use distributed reads. Either way the layout is plain
    parquet — both writers produce files the other reader accepts."""
    if _metadata_local(spark, path):
        import pyarrow.parquet as papq

        path = _strip_file_scheme(path)
        ct = papq.read_table(f"{path}/centroids").sort_by("cid")
        centroids = np.array(ct["cvec"].to_pylist(), dtype=np.float64)
        meta = papq.read_table(f"{path}/meta").to_pylist()[0]
        bt = papq.read_table(f"{path}/codebooks").sort_by("i")
        books = np.array(bt["row"].to_pylist(), dtype=np.float64).reshape(
            meta["m"], meta["ks"], meta["dsub"]
        )
        return centroids, books
    cents = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    centroids = np.array([r["cvec"] for r in cents], dtype=np.float64)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    rows = spark.read.parquet(f"{path}/codebooks").orderBy("i").collect()
    books = np.array([r["row"] for r in rows], dtype=np.float64).reshape(
        meta["m"], meta["ks"], meta["dsub"]
    )
    return centroids, books


def ivfpq_search_index(
    queries: DataFrame,
    path: str,
    k: int = 10,
    nprobe: int = 4,
    q_id: str = "qid",
    q_vec: str = "vec",
    rerank: int | None = None,
    base: DataFrame | None = None,
    b_id: str = "id",
    b_vec: str = "vec",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Search a persisted IVF-PQ artifact. The probed cell ids (≤ nlist
    values) are applied as a literal ``isin`` predicate so the codes
    scan provably partition-prunes (`PartitionFilters` in the plan);
    the ADC kernel then sees only probed-cell rows. Results are
    IDENTICAL to the in-memory ivfpq_knn with the same arrays (pinned
    by test). ``rerank=R`` exact-rescoring needs the raw vectors, which
    the artifact deliberately does not store (codes are 1/64 the bytes)
    — pass the vector table as ``base``. ``allowed`` restricts to a
    metadata-filtered id subset (semi join after the partition-pruned
    scan — filtered ANN, same contract as :func:`ivfpq_knn`)."""
    spark = queries.sparkSession
    centroids, codebooks = load_ivfpq_arrays(spark, path)
    qids, Q = _collect_queries(queries, q_id, q_vec)
    probes_of, luts = _probes_and_luts(Q, centroids, codebooks, nprobe)
    inv = spark.read.parquet(f"{path}/codes").filter(
        F.col("cid").isin([int(c) for c in sorted(probes_of)])
    )
    if allowed is not None:
        inv = inv.join(
            allowed.select(F.col("id").cast("long").alias("id")), "id", "semi"
        )
    shortlist = k if rerank is None else max(k, rerank)
    ranked = _adc_probe_topk(inv, qids, luts, probes_of, shortlist)
    if rerank is None:
        return ranked
    if base is None:
        raise ValueError(
            "rerank needs the raw vector table: the IVF-PQ artifact stores "
            "codes only - pass base=<DataFrame with (id, vec)>"
        )
    return _rerank_against(ranked, queries, base, k, q_id, q_vec, b_id, b_vec)
