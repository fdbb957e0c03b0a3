"""Streaming upsert into a persisted IVF-PQ serving artifact.

The graph index has an incremental-insert path (streaming/ingest.py);
this is the same capability for the compressed IVF-PQ artifact — the
serving plan a 100 TB corpus actually runs. New vectors arrive on a
stream; each micro-batch is cell-assigned and PQ-encoded with the
artifact's FROZEN quantizers (loaded once at stream start, broadcast to
the batch pass) and appended to ``<index>/codes`` under the same
``cid=`` partitioning. The next search over the artifact sees the new
rows with no reindexing — appends land inside exactly the partitions
that partition-pruned scans already read.

Freezing the quantizers is what makes upsert O(batch): assignment and
encoding are per-row functions of the stored arrays, so a streamed
vector produces the IDENTICAL (cid, codes) row a full rebuild would
(pinned by test). The cost is drift: as the incoming distribution moves
away from the fit sample, cell occupancy skews and ADC error grows —
the same degradation signal as the reference's incremental graph-insert
study (BASELINE.md: search steps ~2× after +10% inserts). The
compaction analog is :func:`refit_ivfpq`: refit both quantizers on the
full current vector set and rewrite the artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def ivfpq_upsert_stream(
    vectors_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
) -> StreamingQuery:
    """Consume a vector stream into the IVF-PQ artifact at ``index_path``
    (created by ``operators.ivfpq.save_ivfpq_index``). Per micro-batch:
    one fused encode+assign Arrow pass with the artifact's arrays, one
    partitioned append — no join, no shuffle beyond the write."""
    from vectordbindexing_spark.operators.ivfpq import (
        ivfpq_encode_assign,
        load_ivfpq_arrays,
    )

    spark = vectors_stream.sparkSession
    centroids, codebooks = load_ivfpq_arrays(spark, index_path)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        inv = ivfpq_encode_assign(
            batch_df, centroids, codebooks, b_id=id_col, b_vec=vec_col
        )
        inv.write.mode("append").partitionBy("cid").parquet(
            f"{index_path}/codes"
        )

    return (
        vectors_stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def refit_ivfpq(
    vectors: DataFrame,
    out_path: str,
    nlist: int = 16,
    m: int = 8,
    ks: int = 16,
    max_iter: int = 3,
    id_col: str = "id",
    vec_col: str = "vec",
    fit: str = "driver",
) -> None:
    """Compaction: refit coarse centroids + codebooks on the CURRENT full
    vector set (base + everything streamed since the last fit) and write
    a fresh artifact — restores quantization quality after drift, exactly
    as compact_deltas restores graph search cost. ``vectors`` is the raw
    vector table; the artifact stores only codes, so the caller owns the
    vector-of-record table (at 100 TB that table is the corpus itself).

    ``fit='driver'`` (default) trains centroids on the bounded sample
    (ivf.kmeans_fit — right up to nlist ≈ sample/40);
    ``fit='distributed'`` runs full-corpus Lloyd updates
    (ivf.kmeans_fit_distributed) for planner-scale nlist beyond the
    sample budget."""
    from vectordbindexing_spark.operators.ivf import (
        kmeans_fit,
        kmeans_fit_distributed,
    )
    from vectordbindexing_spark.operators.ivfpq import save_ivfpq_index
    from vectordbindexing_spark.operators.pq import pq_fit

    if fit not in ("driver", "distributed"):
        raise ValueError(f"fit must be 'driver' or 'distributed', got {fit!r}")
    v = vectors.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias(vec_col)
    ).localCheckpoint(eager=True)  # consumed by both fits + the save scan
    fit_fn = kmeans_fit if fit == "driver" else kmeans_fit_distributed
    centroids = fit_fn(v, nlist, max_iter, id_col, vec_col)
    codebooks = pq_fit(v, m, ks, max_iter, id_col, vec_col)
    save_ivfpq_index(v, centroids, codebooks, out_path, id_col, vec_col)
