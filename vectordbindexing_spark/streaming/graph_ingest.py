"""Streaming upsert into a persisted two-layer GRAPH serving artifact —
the graph analog of streaming/ivfpq_ingest.py (reference study:
`hnsw_insert.ipynb`, +1%…+10% incremental inserts).

State layout under ``index_dir`` (each bucket dir swapped crash-safely
via streaming/atomic.py, so a crash at any point leaves a servable
artifact):

* ``vectors``  — parquet partitioned by ``bucket = pmod(xxhash64(id),
  B)``: (id, vec), the full current corpus
* ``edges``    — parquet partitioned by ``bucket = pmod(xxhash64(src),
  B)``: (layer, src, dst, dist), the serving graph
* ``meta.json``— {n_at_rebuild, build params, buckets}; written
  atomically (write-temp + os.replace) so a crash mid-dump can never
  brick the artifact.

Per micro-batch (:func:`upsert_graph_artifact`):

1. kNN edges of the NEW nodes against (stored ∪ batch) — below
   ``exact_base_limit`` one blocked exact pass (O(n·|B|), the
   per-insert cost of the reference's `add_items_batch` amortized over
   the batch, hnsw_cosine_norm.py:480-580); past it the pass dispatches
   through ``plans.knn_planner.knn`` (the mine_triplets treatment), so
   a 100 TB corpus pays an IVF/IVF-PQ probe, not a full scan. Layer-1
   edges likewise over the level≥1 subset (level assignment is a
   deterministic function of the id, graph.py:26, so stored nodes keep
   their levels without re-reading anything).
2. DIRTY-SCOPED ``mutualize``: only nodes whose adjacency can change —
   the batch ids, the new edges' endpoints, and nodes that lose an
   edge to a replaced id — are re-capped (same bidirection +
   degree-cap pass the bulk build ends with, graph.py:530, restricted
   to the dirty set; equal to the full pass on those nodes because the
   stored graph is already a mutualize fixed point and untouched nodes
   gain no candidates). Everything else keeps its stored rows
   verbatim.
3. Crash-safe swap of ONLY the dirty buckets of both artifacts
   (atomic.swap_in_buckets): per-batch write I/O scales with
   |batch|·degree, not with the corpus — the O(corpus)-rewrite flaw of
   the first version. The whole step is replay-idempotent by
   DETECTION: a redelivered batch (every id stored with a
   bit-identical vector and layer-0 adjacency present) returns
   ``"noop"`` without touching state — recomputation could drift in
   the last distance ulp (BLAS batch shape), so exact replay is
   guaranteed by not recomputing. A crash between the vectors swap
   and the edges swap is caught by the adjacency check
   (``needs_edges``) and completed on replay.

UPDATE semantics (same id, different vector): the BATCH side wins
deterministically — stored rows with a redelivered id are anti-joined
away, and within one batch duplicate ids resolve to the greatest vec
(array ordering), never ``F.first``'s partition-order roulette. Edges
incident to a replaced id are dropped before the merge (their dists
describe the old vector) and rebuilt from the fresh kNN pass, so an
update leaves no stale geometry behind.

Drift + refresh: upserted nodes never enter OLD nodes' own kNN lists
except via back-links (classic incremental-HNSW semantics), so search
cost degrades as the inserted fraction grows — the reference measures
~2× search steps at +10% inserts (BASELINE.md), the signal to compact.
When the corpus grows past ``refresh_factor`` × its size at the last
rebuild, the upsert runs :func:`operators.graph.build_two_layer_index`
on the full union instead: after a refresh the artifact is EXACTLY the
bulk build of the union corpus (same function, same params — pinned by
test), which is the "upserted serving ≡ full rebuild" anchor.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectordbindexing_spark.streaming.atomic import (
    recover_tree,
    swap_in,
    swap_in_buckets,
    write_json_atomic,
)

EDGE_SCHEMA = "layer int, src long, dst long, dist double"

#: default bucket count for the partitioned artifact dirs. A batch
#: dirties ≈ |batch|·(M0+1) edge srcs, and the rewritten fraction is
#: ≈ 1 − exp(−dirty/buckets) — so buckets must sit well ABOVE the
#: expected dirty-src count for the bucket swap to beat a full
#: rewrite (measured at 500k/M0=16: 256 buckets → a 100-row batch
#: dirties 254/256; 4096 → ~1/3). Size upward with the corpus so each
#: bucket still holds healthy parquet files (≥ a few MB).
DEFAULT_BUCKETS = 1024


def _paths(index_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(index_dir, "vectors"),
        os.path.join(index_dir, "edges"),
        os.path.join(index_dir, "meta.json"),
    )


def _bucket_of(col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


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
    buckets: int = DEFAULT_BUCKETS,
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
    swap_in(
        vecs.withColumn("bucket", _bucket_of("id", buckets)),
        vec_path, coalesce=None, partition_by=["bucket"],
    )
    swap_in(
        edges.withColumn("bucket", _bucket_of("src", buckets)),
        edge_path, coalesce=None, partition_by=["bucket"],
    )
    n = base.sparkSession.read.parquet(vec_path).count()
    write_json_atomic(
        meta_path,
        {
            "n_at_rebuild": n,
            "buckets": buckets,
            **_build_params(M0, M1, M_level, metric),
        },
    )


def _knn_edges(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    metric: str,
    layer: int,
    exact_base_limit: int,
    planner_kwargs: dict,
) -> DataFrame:
    """Batch-vs-corpus kNN for one layer: blocked exact below the
    limit (bit-stable, what the parity pins replay), planner-dispatched
    (IVF/IVF-PQ/SQ8 by scale) past it."""
    n_b = base.limit(exact_base_limit + 1).count()
    if n_b <= exact_base_limit:
        from vectordbindexing_spark.operators.exact_knn import exact_knn

        raw = exact_knn(
            queries, base, k=k, metric=metric,
            q_id="id", q_vec="vec", b_id="id", b_vec="vec",
            exclude_self=True,
        )
    else:
        from vectordbindexing_spark.plans.knn_planner import knn as planner_knn

        pk = {"approximate_ok": True, "repeated_queries": True}
        pk.update(planner_kwargs)
        raw = planner_knn(
            queries, base, k=k + 1, metric=metric,
            q_id="id", q_vec="vec", b_id="id", b_vec="vec", **pk,
        ).where(F.col("neighbor_id") != F.col("qid"))  # planner lacks
        # exclude_self; overfetch one and drop the self-hit
    return raw.select(
        F.lit(layer).alias("layer"),
        F.col("qid").alias("src"),
        F.col("neighbor_id").alias("dst"),
        "dist",
    )


def upsert_graph_artifact(
    batch: DataFrame,
    index_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
    refresh_factor: float = 1.5,
    exact_base_limit: int | None = None,
    planner_kwargs: dict | None = None,
) -> str:
    """One foreachBatch step. Returns ``"noop"`` (empty batch),
    ``"upsert"`` (incremental edges merged into the dirty buckets) or
    ``"rebuild"`` (growth crossed ``refresh_factor`` × the corpus size
    at the last rebuild — full bulk build on the union, the
    compaction).

    ``exact_base_limit``/``planner_kwargs``: the scale route — the
    batch-vs-corpus kNN pass dispatches through plans.knn_planner.knn
    when the corpus exceeds the limit (default
    plans.knn_planner.EXACT_BASE_LIMIT); kwargs forward planner options
    (recall_target, memory_tight, threshold overrides for tests)."""
    from vectordbindexing_spark.operators.graph import (
        assign_levels,
        build_two_layer_index,
        mutualize,
    )
    from vectordbindexing_spark.plans.knn_planner import EXACT_BASE_LIMIT

    ebl = EXACT_BASE_LIMIT if exact_base_limit is None else exact_base_limit
    pk = planner_kwargs or {}
    spark = batch.sparkSession
    vec_path, edge_path, meta_path = _paths(index_dir)
    recover_tree(vec_path)
    recover_tree(edge_path)
    meta = json.load(open(meta_path))
    M0, M1 = meta["M0"], meta["M1"]
    M_level, metric = meta["M_level"], meta["metric"]
    buckets = meta["buckets"]

    # deterministic in-batch winner for duplicate ids: greatest vec by
    # array ordering (replays are identical rows, so this only matters
    # when one batch really carries conflicting payloads)
    new = (
        batch.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).alias("vec"),
        )
        .where(F.col("vec").isNotNull())
        .groupBy("id")
        .agg(F.max("vec").alias("vec"))
        .localCheckpoint(eager=True)
    )
    if new.isEmpty():
        return "noop"
    vecs_raw = spark.read.parquet(vec_path)
    edges_raw = spark.read.parquet(edge_path)
    stored = vecs_raw.drop("bucket")
    old_edges = edges_raw.drop("bucket")
    # the batch's bucket footprint — bounded by |batch|, collected once
    # and reused for partition pruning on the artifact scans below
    batch_bkts = [
        r[0]
        for r in new.select(_bucket_of("id", buckets)).distinct().collect()
    ]

    # classify the batch against the store. REPLAY DETECTION: a
    # redelivered batch (every id stored with a bit-identical vector
    # and already wired into the graph) is a no-op on the state — the
    # only way replay can be exact, since recomputing kNN dists is
    # deterministic only up to BLAS batch shape (low-bit drift).
    fresh = new.join(stored.select("id"), "id", "left_anti")
    same_t = stored.select("id", F.col("vec").alias("_sv"))
    matched = new.join(same_t, "id")
    changed = (
        matched.where(F.col("vec") != F.col("_sv"))
        .select("id", "vec")
        .localCheckpoint(eager=True)
    )
    # redelivered-unchanged ids missing their layer-0 adjacency: the
    # crash window between the vectors swap and the edges swap — they
    # need edges even though their vector is already stored. The probe
    # only needs srcs in the batch's own buckets — partition-pruned.
    needs_edges = (
        matched.where(F.col("vec") == F.col("_sv"))
        .select("id", "vec")
        .join(
            edges_raw.where(F.col("bucket").isin(batch_bkts))
            .where(F.col("layer") == 0)
            .select(F.col("src").alias("id")),
            "id", "left_anti",
        )
    )
    # the rows that need NEW edges (and whose ids' buckets get dirty)
    ins = (
        fresh.unionByName(changed)
        .unionByName(needs_edges)
        .localCheckpoint(eager=True)
    )
    if ins.isEmpty():
        return "noop"
    ins_ids = ins.select("id")
    # ids being UPDATED: their old edges describe the old vector
    replaced = changed.select("id")
    # batch wins deterministically for updates; unchanged redelivered
    # ids keep their stored row (bit-identical anyway). Deliberately
    # NOT checkpointed: the lineage (parquet scan + broadcast anti +
    # tiny unions) is cheap to recompute and reconstruction-stable
    # even after the vectors swap below — checkpointing it would
    # materialize the whole corpus per micro-batch.
    union = (
        stored.join(F.broadcast(replaced), "id", "left_anti")
        .unionByName(changed)
        .unionByName(fresh)
    )
    n_union = union.count()

    if n_union >= refresh_factor * meta["n_at_rebuild"]:
        # materialize BEFORE the vectors swap: the build's lineage
        # reads the pre-swap vec_path file listing, which the rename
        # below invalidates (a rebuild is O(corpus) compaction anyway)
        edges = build_two_layer_index(
            union, M0=M0, M1=M1, metric=metric, M_level=M_level
        ).localCheckpoint(eager=True)
        swap_in(
            union.withColumn("bucket", _bucket_of("id", buckets)),
            vec_path, coalesce=None, partition_by=["bucket"],
        )
        swap_in(
            edges.withColumn("bucket", _bucket_of("src", buckets)),
            edge_path, coalesce=None, partition_by=["bucket"],
        )
        meta["n_at_rebuild"] = n_union
        write_json_atomic(meta_path, meta)
        return "rebuild"

    # incremental edges: inserted/updated nodes vs the union — exact
    # below the limit, planner-routed past it — + layer-1 over the
    # deterministic level>=1 subset
    l0 = _knn_edges(ins, union, M0, metric, 0, ebl, pk)
    up_ins = assign_levels(ins, M=M_level).filter(F.col("level") >= 1)
    up_union = assign_levels(union, M=M_level).filter(F.col("level") >= 1)
    l1 = _knn_edges(
        up_ins.select("id", "vec"), up_union.select("id", "vec"),
        M1, metric, 1, ebl, pk,
    )
    new_edges = l0.unionByName(l1).localCheckpoint(eager=True)

    repl = F.broadcast(replaced.withColumnRenamed("id", "_rid"))
    # DIRTY set: nodes whose adjacency can change — batch ids, new
    # edges' endpoints, and nodes losing a stale edge to a replaced id
    losers = (
        old_edges.join(repl, old_edges["dst"] == F.col("_rid"), "left_semi")
        .select(F.col("src").alias("id"))
    )
    dirty = (
        ins_ids.unionByName(new_edges.select(F.col("dst").alias("id")))
        .unionByName(losers)
        .distinct()
        .localCheckpoint(eager=True)
    )
    dirty_b = F.broadcast(dirty)
    # candidate rows for the dirty re-cap: stored edges touching a
    # dirty node, minus stale rows (either endpoint replaced — their
    # dists describe the old vector)
    clean = (
        old_edges.join(repl, old_edges["src"] == F.col("_rid"), "left_anti")
        .join(repl, old_edges["dst"] == F.col("_rid"), "left_anti")
    )
    flagged = (
        clean.join(
            dirty_b.select(F.col("id").alias("src"), F.lit(1).alias("_ds")),
            "src", "left",
        )
        .join(
            dirty_b.select(F.col("id").alias("dst"), F.lit(1).alias("_dd")),
            "dst", "left",
        )
    )
    old_rel = flagged.where(
        F.col("_ds").isNotNull() | F.col("_dd").isNotNull()
    ).select("layer", "src", "dst", "dist")
    # dirty-scoped mutualize == the full pass restricted to dirty srcs:
    # a dirty node's full-pass candidates are its own stored rows, the
    # reverses of stored rows pointing AT it, and the new edges — all
    # present in (old_rel ∪ new_edges); non-dirty rows are a mutualize
    # fixed point and gain no candidates, so they stay verbatim.
    merged_dirty = mutualize(
        old_rel.unionByName(new_edges), max_degree=2 * max(M0, M1)
    ).join(dirty_b.withColumnRenamed("id", "src"), "src", "left_semi")

    # rewrite ONLY dirty buckets: each keeps its untouched srcs' rows.
    # The dirty bucket list is collected (bounded by `buckets`) so the
    # keep-scan partition-prunes to the dirty subdirs instead of
    # re-reading the whole edge artifact.
    dirty_bkts = sorted(
        r[0]
        for r in dirty.select(_bucket_of("id", buckets))
        .distinct()
        .collect()
    )
    keep = (
        edges_raw.where(F.col("bucket").isin(dirty_bkts))
        .join(dirty_b.withColumnRenamed("id", "src"), "src", "left_anti")
    )
    # no eager checkpoints on the big outputs: swap_in_buckets fully
    # materializes each into its temp dir BEFORE any rename, so a
    # second materialization would only double the I/O. Lineage safety:
    # vecs_out (reads vec_path) swaps first, while vec_path is
    # untouched; edges_out reads ONLY edge_path (old_edges) and the
    # checkpointed new_edges/dirty — never vec_path — so the vectors
    # swap cannot invalidate its file listing.
    edges_out = keep.unionByName(
        merged_dirty.withColumn("bucket", _bucket_of("src", buckets))
    )

    # vector rows actually change only for inserts and updates; their
    # bucket list (⊆ batch_bkts, bounded by |batch|) partition-prunes
    # the stored-vector scan to the buckets being rewritten
    vb_list = sorted(
        r[0]
        for r in fresh.select("id")
        .unionByName(replaced)
        .select(_bucket_of("id", buckets))
        .distinct()
        .collect()
    )
    vecs_out = (
        vecs_raw.where(F.col("bucket").isin(vb_list))
        .drop("bucket")
        .join(F.broadcast(replaced), "id", "left_anti")
        .unionByName(changed)
        .unionByName(fresh)
        .withColumn("bucket", _bucket_of("id", buckets))
    )
    # vectors first: a crash between the two swaps leaves vectors a
    # SUPERSET of the edges' endpoints (unreachable rows, servable);
    # the replayed batch then lands on the needs_edges path above and
    # completes the graph. The reverse order could serve edges whose
    # endpoints have no vector.
    if not vecs_out.isEmpty():
        swap_in_buckets(vecs_out, vec_path)
    swap_in_buckets(edges_out, edge_path)
    return "upsert"


def load_graph_artifact(spark: SparkSession, index_dir: str):
    """(vectors_df, edges_df, meta) — feed to
    operators.search.compact_index / graph_search for serving."""
    vec_path, edge_path, meta_path = _paths(index_dir)
    recover_tree(vec_path)
    recover_tree(edge_path)
    return (
        spark.read.parquet(vec_path).drop("bucket"),
        spark.read.parquet(edge_path).drop("bucket"),
        json.load(open(meta_path)),
    )


def graph_upsert_stream(
    vectors_stream: DataFrame,
    index_dir: str,
    checkpoint: str,
    id_col: str = "id",
    vec_col: str = "vec",
    refresh_factor: float = 1.5,
    exact_base_limit: int | None = None,
    planner_kwargs: dict | None = None,
) -> StreamingQuery:
    """Attach the artifact maintainer to a vector stream; returns the
    StreamingQuery (caller awaits/stops). The artifact must exist
    (:func:`init_graph_artifact`)."""
    return (
        vectors_stream.writeStream.foreachBatch(
            lambda b, _id: upsert_graph_artifact(
                b, index_dir, id_col=id_col, vec_col=vec_col,
                refresh_factor=refresh_factor,
                exact_base_limit=exact_base_limit,
                planner_kwargs=planner_kwargs,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
