"""Streaming upsert into a persisted two-layer GRAPH serving artifact —
the graph analog of streaming/ivfpq_ingest.py (reference study:
`hnsw_insert.ipynb`, +1%…+10% incremental inserts).

State layout under ``index_dir`` (both swapped crash-safely via
streaming/atomic.py, so a crash at any point leaves a servable
artifact):

* ``vectors``  — parquet (id, vec), the full current corpus
* ``edges``    — parquet (layer, src, dst, dist), the serving graph
* ``meta.json``— {n_at_rebuild} for the refresh trigger

Per micro-batch (:func:`upsert_graph_artifact`):

1. kNN edges of the NEW nodes against (stored ∪ batch) — one blocked
   exact pass, O(n·|B|) work, the per-insert cost of the reference's
   `add_items_batch` amortized over the batch (hnsw_cosine_norm.py:
   480-580). Layer-1 edges likewise over the level≥1 subset (level
   assignment is a deterministic function of the id, graph.py:26, so
   stored nodes keep their levels without re-reading anything).
2. ``mutualize(old_edges ∪ new_edges)`` — the SAME bidirection +
   degree-cap pass the bulk build ends with (graph.py:530), so new
   nodes get back-links from their neighbors (without which they would
   be unreachable) and affected old nodes re-cap by distance exactly
   like a rebuild would. Everything else is untouched rows flowing
   through one groupBy.
3. Crash-safe swap of both parquet dirs. The whole step is
   replay-idempotent: the batch's kNN edges are a deterministic
   function of (vectors ∪ batch), vectors dedupe by id, and mutualize
   canonicalizes duplicates — so foreachBatch needs no ledger.

Drift + refresh: upserted nodes never enter OLD nodes' own kNN lists
except via back-links (classic incremental-HNSW semantics), so search
cost degrades as the inserted fraction grows — the reference measures
~2× search steps at +10% inserts (BASELINE.md), the signal to compact.
When the corpus grows past ``refresh_factor`` × its size at the last
rebuild, the upsert runs :func:`operators.graph.build_two_layer_index`
on the full union instead: after a refresh the artifact is EXACTLY the
bulk build of the union corpus (same function, same params — pinned by
test), which is the "upserted serving ≡ full rebuild" anchor.

100 TB note: the per-batch cost is one batch-vs-corpus scan plus an
O(E) groupBy and an O(n) artifact rewrite. Size batches so the rewrite
amortizes (or store edges bucketed by src and rewrite only dirty
buckets); past EXACT_BASE_LIMIT route step 1 through
plans.knn_planner.knn like mine_triplets does.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectordbindexing_spark.streaming.atomic import recover, swap_in

EDGE_SCHEMA = "layer int, src long, dst long, dist double"


def _paths(index_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(index_dir, "vectors"),
        os.path.join(index_dir, "edges"),
        os.path.join(index_dir, "meta.json"),
    )


def _build_params(M0: int, M1: int, M_level: int, metric: str) -> dict:
    return {"M0": M0, "M1": M1, "M_level": M_level, "metric": metric}


def init_graph_artifact(
    base: DataFrame,
    index_dir: str,
    M0: int = 32,
    M1: int = 16,
    metric: str = "cosine",
    M_level: int = 16,
    id_col: str = "id",
    vec_col: str = "vec",
) -> None:
    """Bulk-build the artifact from an initial corpus (the backfill)."""
    from vectordbindexing_spark.operators.graph import build_two_layer_index

    os.makedirs(index_dir, exist_ok=True)
    vec_path, edge_path, meta_path = _paths(index_dir)
    vecs = base.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
    ).where(F.col("vec").isNotNull())
    edges = build_two_layer_index(
        vecs, M0=M0, M1=M1, metric=metric, M_level=M_level
    )
    swap_in(vecs, vec_path, coalesce=None)
    swap_in(edges, edge_path, coalesce=None)
    n = base.sparkSession.read.parquet(vec_path).count()
    with open(meta_path, "w") as f:
        json.dump({"n_at_rebuild": n, **_build_params(M0, M1, M_level, metric)}, f)


def upsert_graph_artifact(
    batch: DataFrame,
    index_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
    refresh_factor: float = 1.5,
) -> str:
    """One foreachBatch step. Returns ``"noop"`` (empty batch),
    ``"upsert"`` (incremental edges merged) or ``"rebuild"`` (growth
    crossed ``refresh_factor`` × the corpus size at the last rebuild —
    full bulk build on the union, the compaction)."""
    from vectordbindexing_spark.operators.exact_knn import exact_knn
    from vectordbindexing_spark.operators.graph import (
        assign_levels,
        build_two_layer_index,
        mutualize,
    )

    spark = batch.sparkSession
    vec_path, edge_path, meta_path = _paths(index_dir)
    recover(vec_path)
    recover(edge_path)
    meta = json.load(open(meta_path))
    M0, M1 = meta["M0"], meta["M1"]
    M_level, metric = meta["M_level"], meta["metric"]

    new = (
        batch.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).alias("vec"),
        )
        .where(F.col("vec").isNotNull())
        .localCheckpoint(eager=True)
    )
    if new.isEmpty():
        return "noop"
    stored = spark.read.parquet(vec_path)
    # replay-idempotent union: a redelivered batch dedupes away by id
    union = (
        stored.unionByName(new)
        .groupBy("id")
        .agg(F.first("vec").alias("vec"))
        .localCheckpoint(eager=True)
    )
    n_union = union.count()

    if n_union >= refresh_factor * meta["n_at_rebuild"]:
        edges = build_two_layer_index(
            union, M0=M0, M1=M1, metric=metric, M_level=M_level
        ).localCheckpoint(eager=True)
        edges.count()
        swap_in(union, vec_path, coalesce=None)
        swap_in(edges, edge_path, coalesce=None)
        meta["n_at_rebuild"] = n_union
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        return "rebuild"

    # incremental edges: batch nodes vs the union (blocked exact pass —
    # the batch side broadcasts; past EXACT_BASE_LIMIT swap in the
    # planner route), + layer-1 over the deterministic level>=1 subset
    l0 = exact_knn(
        new, union, k=M0, metric=metric,
        q_id="id", q_vec="vec", b_id="id", b_vec="vec", exclude_self=True,
    ).select(
        F.lit(0).alias("layer"),
        F.col("qid").alias("src"),
        F.col("neighbor_id").alias("dst"),
        "dist",
    )
    up_new = assign_levels(new, M=M_level).filter(F.col("level") >= 1)
    up_union = assign_levels(union, M=M_level).filter(F.col("level") >= 1)
    l1 = exact_knn(
        up_new.select("id", "vec"), up_union.select("id", "vec"),
        k=M1, metric=metric,
        q_id="id", q_vec="vec", b_id="id", b_vec="vec", exclude_self=True,
    ).select(
        F.lit(1).alias("layer"),
        F.col("qid").alias("src"),
        F.col("neighbor_id").alias("dst"),
        "dist",
    )
    old_edges = spark.read.parquet(edge_path)
    # one mutualize merges everything: new nodes gain back-links (the
    # reverse direction), touched old nodes re-cap by distance, and a
    # replayed batch's identical edges dedupe in the groupBy
    merged = mutualize(
        old_edges.unionByName(l0).unionByName(l1),
        max_degree=2 * max(M0, M1),
    ).localCheckpoint(eager=True)
    merged.count()
    swap_in(union, vec_path, coalesce=None)
    swap_in(merged, edge_path, coalesce=None)
    return "upsert"


def load_graph_artifact(spark: SparkSession, index_dir: str):
    """(vectors_df, edges_df, meta) — feed to
    operators.search.compact_index / graph_search for serving."""
    vec_path, edge_path, meta_path = _paths(index_dir)
    recover(vec_path)
    recover(edge_path)
    return (
        spark.read.parquet(vec_path),
        spark.read.parquet(edge_path),
        json.load(open(meta_path)),
    )


def graph_upsert_stream(
    vectors_stream: DataFrame,
    index_dir: str,
    checkpoint: str,
    id_col: str = "id",
    vec_col: str = "vec",
    refresh_factor: float = 1.5,
) -> StreamingQuery:
    """Attach the artifact maintainer to a vector stream; returns the
    StreamingQuery (caller awaits/stops). The artifact must exist
    (:func:`init_graph_artifact`)."""
    return (
        vectors_stream.writeStream.foreachBatch(
            lambda b, _id: upsert_graph_artifact(
                b, index_dir, id_col=id_col, vec_col=vec_col,
                refresh_factor=refresh_factor,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
