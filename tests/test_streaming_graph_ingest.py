"""Graph-artifact streaming upsert: incremental inserts stay servable
(new nodes reachable via back-links), replay is idempotent, and the
periodic refresh makes the artifact EXACTLY the bulk build of the
union corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordbindexing_spark.io.synthetic import (
    synthetic_queries,
    synthetic_vectors,
)
from vectordbindexing_spark.operators.exact_knn import exact_knn
from vectordbindexing_spark.operators.graph import build_two_layer_index
from vectordbindexing_spark.operators.search import (
    compact_index,
    graph_search,
)
from vectordbindexing_spark.streaming.graph_ingest import (
    graph_upsert_stream,
    init_graph_artifact,
    load_graph_artifact,
    upsert_graph_artifact,
)

N0, NB, D, K = 600, 100, 16, 10
M0, M1 = 16, 8


@pytest.fixture(scope="module")
def corpus(spark):
    full = synthetic_vectors(spark, N0 + 2 * NB, D, n_modalities=8).select(
        "id", "vec"
    ).localCheckpoint(eager=True)
    base = full.where(F.col("id") < N0)
    b1 = full.where((F.col("id") >= N0) & (F.col("id") < N0 + NB))
    b2 = full.where(F.col("id") >= N0 + NB)
    q = synthetic_queries(spark, 50, D, n_modalities=8).select(
        "qid", "vec"
    ).localCheckpoint(eager=True)
    return full, base, b1, b2, q


def _recall(spark, q, vecs, edges, gt):
    idx = compact_index(edges, vecs)
    pred = graph_search(q, idx, k=K, ef_search=64)
    both = (
        pred.groupBy("qid").agg(F.collect_set("neighbor_id").alias("p"))
        .join(gt, "qid")
    )
    return both.select(
        F.avg(F.size(F.array_intersect("p", "g")) / float(K)).alias("r")
    ).first()["r"]


def _gt(q, vecs):
    return (
        exact_knn(q, vecs, K, "cosine")
        .groupBy("qid")
        .agg(F.collect_set("neighbor_id").alias("g"))
        .localCheckpoint(eager=True)
    )


def test_upsert_keeps_new_nodes_servable_and_refresh_equals_rebuild(
    spark, corpus, tmp_path
):
    full, base, b1, b2, q = corpus
    art = str(tmp_path / "graph_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)

    # batch 1: incremental (no refresh at factor 2.0)
    assert upsert_graph_artifact(b1, art, refresh_factor=2.0) == "upsert"
    vecs, edges, meta = load_graph_artifact(spark, art)
    union1 = base.unionByName(b1)
    assert vecs.count() == N0 + NB

    # new nodes must be REACHABLE: back-links exist and queries recover
    # them — compare against the bulk rebuild of the same union
    gt1 = _gt(q, union1)
    r_upsert = _recall(spark, q, vecs, edges, gt1)
    rebuilt = build_two_layer_index(union1, M0=M0, M1=M1)
    r_rebuild = _recall(spark, q, union1, rebuilt, gt1)
    assert r_upsert >= r_rebuild - 0.05, (r_upsert, r_rebuild)
    assert r_upsert >= 0.8, r_upsert
    # incoming edges to inserted nodes exist on layer 0
    incoming = edges.where(
        (F.col("layer") == 0) & (F.col("dst") >= N0)
    ).count()
    assert incoming > 0

    # replay of the SAME batch is DETECTED and no-ops on the state
    before = sorted(map(tuple, edges.collect()))
    assert upsert_graph_artifact(b1, art, refresh_factor=2.0) == "noop"
    _, edges_replay, _ = load_graph_artifact(spark, art)
    assert sorted(map(tuple, edges_replay.collect())) == before

    # batch 2 crosses refresh_factor 1.2 -> full rebuild on the union;
    # the artifact must now equal the bulk build EXACTLY
    assert upsert_graph_artifact(b2, art, refresh_factor=1.2) == "rebuild"
    vecs2, edges2, meta2 = load_graph_artifact(spark, art)
    assert meta2["n_at_rebuild"] == N0 + 2 * NB
    want = build_two_layer_index(full, M0=M0, M1=M1)
    got_rows = sorted(
        (r["layer"], r["src"], r["dst"]) for r in edges2.collect()
    )
    want_rows = sorted(
        (r["layer"], r["src"], r["dst"]) for r in want.collect()
    )
    assert got_rows == want_rows


def test_graph_upsert_stream_end_to_end(spark, corpus, tmp_path):
    full, base, b1, b2, q = corpus
    art = str(tmp_path / "stream_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)
    feed = str(tmp_path / "feed")
    b1.write.parquet(feed + "/b1")

    stream = spark.readStream.schema("id long, vec array<double>").parquet(
        feed + "/*"
    )
    qy = graph_upsert_stream(
        stream, art, str(tmp_path / "ckpt"), refresh_factor=5.0
    )
    qy.awaitTermination(300)
    vecs, edges, _ = load_graph_artifact(spark, art)
    assert vecs.count() == N0 + NB
    gt1 = _gt(q, base.unionByName(b1))
    assert _recall(spark, q, vecs, edges, gt1) >= 0.8


def test_update_same_id_new_vector_batch_wins_and_stale_edges_drop(
    spark, corpus, tmp_path
):
    """Re-ingesting a stored id with a DIFFERENT vector: the batch side
    wins deterministically, the id's old edges (stale dists) are gone,
    and every surviving edge incident to it matches the new geometry."""
    import numpy as np

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "upd_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)

    upd_id = 7
    newvec = [float(i % 3) + 0.25 for i in range(D)]
    upd = spark.createDataFrame([(upd_id, newvec)], "id long, vec array<double>")
    assert upsert_graph_artifact(upd, art, refresh_factor=10.0) == "upsert"
    vecs, edges, _ = load_graph_artifact(spark, art)
    got = vecs.where(F.col("id") == upd_id).collect()
    assert len(got) == 1 and list(got[0]["vec"]) == newvec  # batch won

    # every edge touching upd_id must price the NEW vector: recompute
    # cosine dists from the stored vectors and compare
    vmap = {r["id"]: np.array(r["vec"]) for r in vecs.collect()}

    def cos(a, b):
        return 1.0 - float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )

    touching = edges.where(
        (F.col("src") == upd_id) | (F.col("dst") == upd_id)
    ).collect()
    assert touching, "updated node must stay wired into the graph"
    for r in touching:
        want = cos(vmap[r["src"]], vmap[r["dst"]])
        assert abs(r["dist"] - want) < 1e-9, (r, want)

    # replay of the update is detected as already applied
    assert upsert_graph_artifact(upd, art, refresh_factor=10.0) == "noop"


def test_in_batch_duplicate_ids_resolve_deterministically(spark, tmp_path):
    """One batch carrying conflicting payloads for the same id resolves
    to the greatest vec by array ordering — never partition-order."""
    base = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], "id long, vec array<double>"
    )
    art = str(tmp_path / "dup_art")
    init_graph_artifact(base, art, M0=4, M1=2)
    dup = spark.createDataFrame(
        [(50, [1.0, 2.0]), (50, [3.0, 4.0]), (50, [2.0, 9.0])],
        "id long, vec array<double>",
    ).repartition(3)
    assert upsert_graph_artifact(dup, art, refresh_factor=10.0) == "upsert"
    vecs, _, _ = load_graph_artifact(spark, art)
    got = vecs.where(F.col("id") == 50).collect()
    assert len(got) == 1 and list(got[0]["vec"]) == [3.0, 4.0]


def test_crash_between_vector_and_edge_swap_heals_on_replay(
    spark, corpus, tmp_path, monkeypatch
):
    """Vectors swapped, edges not (the cross-artifact crash window):
    the replayed batch must land on the needs_edges path and complete
    the graph instead of no-op'ing on the half-applied state."""
    import vectordbindexing_spark.streaming.graph_ingest as gi

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "crash_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)

    def boom(*a, **kw):
        raise OSError("simulated crash before the forward delta append")

    monkeypatch.setattr(gi, "_write_fwd_delta", boom)
    with pytest.raises(OSError):
        upsert_graph_artifact(b1, art, refresh_factor=10.0)
    monkeypatch.undo()

    vecs, edges, _ = load_graph_artifact(spark, art)
    assert vecs.count() == N0 + NB  # vectors landed
    assert edges.where(F.col("src") >= N0).count() == 0  # edges did not

    # stream replay: detected as incomplete, completes the upsert
    assert upsert_graph_artifact(b1, art, refresh_factor=10.0) == "upsert"
    vecs, edges, _ = load_graph_artifact(spark, art)
    gt1 = _gt(q, base.unionByName(b1))
    assert _recall(spark, q, vecs, edges, gt1) >= 0.8
    # and only now is the batch a pure replay
    assert upsert_graph_artifact(b1, art, refresh_factor=10.0) == "noop"


def test_upsert_planner_route_past_exact_limit(spark, corpus, tmp_path):
    """Forcing exact_base_limit below the corpus size sends the
    batch-vs-union kNN through plans.knn_planner.knn (the 100 TB
    route); inserted nodes must still come back servable."""
    full, base, b1, b2, q = corpus
    art = str(tmp_path / "planner_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)
    assert (
        upsert_graph_artifact(
            b1, art, refresh_factor=10.0,
            exact_base_limit=50,
            planner_kwargs={"memory_tight": False},
        )
        == "upsert"
    )
    vecs, edges, _ = load_graph_artifact(spark, art)
    assert vecs.count() == N0 + NB
    # inserted nodes are wired in both directions
    assert edges.where((F.col("layer") == 0) & (F.col("src") >= N0)).count() > 0
    assert edges.where((F.col("layer") == 0) & (F.col("dst") >= N0)).count() > 0
    gt1 = _gt(q, base.unionByName(b1))
    r = _recall(spark, q, vecs, edges, gt1)
    assert r >= 0.7, r


def test_crash_between_vec_and_edge_swap_on_UPDATE_heals_on_replay(
    spark, corpus, tmp_path, monkeypatch
):
    """The update-crash hole: vectors swapped (vec == stored on
    replay, so ``changed`` is empty) while the updated id's OLD
    adjacency is still live (so ``needs_edges`` misses it too). The
    pending ledger must re-queue the id, drop its stale-geometry
    edges, and rebuild them against the new vector."""
    import numpy as np

    import vectordbindexing_spark.streaming.graph_ingest as gi

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "upd_crash_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)

    upd_id = 11
    newvec = [float((i * 7) % 5) + 0.5 for i in range(D)]
    upd = spark.createDataFrame(
        [(upd_id, newvec)], "id long, vec array<double>"
    )

    def boom(*a, **kw):
        raise OSError("simulated crash before the forward delta append")

    monkeypatch.setattr(gi, "_write_fwd_delta", boom)
    with pytest.raises(OSError):
        upsert_graph_artifact(upd, art, refresh_factor=10.0)
    monkeypatch.undo()

    vecs, edges, meta = load_graph_artifact(spark, art)
    got = vecs.where(F.col("id") == upd_id).collect()
    assert len(got) == 1 and list(got[0]["vec"]) == newvec  # vector landed
    assert meta["pending"]["ids"] == [upd_id]  # ledger survived the crash
    assert meta["pending"]["replaced"] == [upd_id]

    # replay must NOT no-op on the half-applied update
    assert upsert_graph_artifact(upd, art, refresh_factor=10.0) == "upsert"
    vecs, edges, meta = load_graph_artifact(spark, art)
    assert "pending" not in meta  # ledger cleared on commit
    vmap = {r["id"]: np.array(r["vec"]) for r in vecs.collect()}

    def cos(a, b):
        return 1.0 - float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )

    touching = edges.where(
        (F.col("src") == upd_id) | (F.col("dst") == upd_id)
    ).collect()
    assert touching, "updated node must stay wired into the graph"
    for r in touching:
        want = cos(vmap[r["src"]], vmap[r["dst"]])
        assert abs(r["dist"] - want) < 1e-9, (r, want)

    # only now is the batch a detected pure replay
    assert upsert_graph_artifact(upd, art, refresh_factor=10.0) == "noop"


def test_rev_edges_mirror_forward_and_n_live_tracks(spark, corpus, tmp_path):
    """The resolved inverted log (base + delta adds − tombstones) must
    stay an exact row mirror of the forward artifact across init,
    upsert and update; n_live is maintained incrementally and matches
    the real corpus size."""
    import vectordbindexing_spark.streaming.graph_ingest as gi

    from vectordbindexing_spark.streaming.graph_ingest import (
        rev_edges_resolved,
    )

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "mirror_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)

    def rows(path):
        return sorted(
            (r["layer"], r["src"], r["dst"], r["dist"])
            for r in gi.edges_resolved(spark, path).collect()
        )

    def rev_rows():
        return sorted(
            (r["layer"], r["src"], r["dst"], r["dist"])
            for r in rev_edges_resolved(spark, art).collect()
        )

    assert rows(art) == rev_rows()
    assert upsert_graph_artifact(b1, art, refresh_factor=10.0) == "upsert"
    assert rows(art) == rev_rows()
    upd = spark.createDataFrame(
        [(3, [0.75] * D)], "id long, vec array<double>"
    )
    assert upsert_graph_artifact(upd, art, refresh_factor=10.0) == "upsert"
    assert rows(art) == rev_rows()
    vecs, _, meta = load_graph_artifact(spark, art)
    assert meta["n_live"] == vecs.count() == N0 + NB


def test_migration_from_unbucketed_artifact_rebuilds(spark, tmp_path):
    """An r08-era artifact (no bucket partitioning, meta without
    "buckets"/"rev"/"n_live") must survive the first post-upgrade
    batch via the rebuild path instead of KeyError'ing."""
    import vectordbindexing_spark.streaming.graph_ingest as gi

    import json as _json

    from vectordbindexing_spark.operators.graph import build_two_layer_index
    from vectordbindexing_spark.streaming import atomic

    base = spark.createDataFrame(
        [(i, [float((i * 3) % 7), float(i % 5), 1.0]) for i in range(60)],
        "id long, vec array<double>",
    )
    art = str(tmp_path / "legacy_art")
    import os

    os.makedirs(art)
    edges = build_two_layer_index(base, M0=4, M1=2, metric="cosine", M_level=16)
    atomic.swap_in(base, art + "/vectors", coalesce=None)
    atomic.swap_in(edges, art + "/edges", coalesce=None)
    atomic.write_json_atomic(
        art + "/meta.json",
        {"n_at_rebuild": 60, "M0": 4, "M1": 2, "M_level": 16,
         "metric": "cosine"},
    )

    batch = spark.createDataFrame(
        [(100, [1.0, 2.0, 3.0]), (101, [2.0, 1.0, 0.5])],
        "id long, vec array<double>",
    )
    assert upsert_graph_artifact(batch, art, refresh_factor=10.0) == "rebuild"
    vecs, edges2, meta = load_graph_artifact(spark, art)
    assert vecs.count() == 62
    assert meta["buckets"] > 0 and meta["rev"] is True
    assert meta["n_live"] == meta["n_at_rebuild"] == 62
    # post-migration batches take the incremental path with the mirror
    b2 = spark.createDataFrame(
        [(102, [0.1, 0.2, 0.9])], "id long, vec array<double>"
    )
    assert upsert_graph_artifact(b2, art, refresh_factor=10.0) == "upsert"
    from vectordbindexing_spark.streaming.graph_ingest import (
        rev_edges_resolved,
    )

    got = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in rev_edges_resolved(spark, art).collect()
    )
    want = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in gi.edges_resolved(spark, art).collect()
    )
    assert got == want


def test_migration_bucketed_but_no_rev_materializes_inverse(
    spark, tmp_path
):
    """An r09-era artifact (bucketed, meta without "rev") gets the
    inverted adjacency materialized once — no rebuild — and proceeds
    incrementally."""
    import vectordbindexing_spark.streaming.graph_ingest as gi

    import json as _json
    import shutil

    base = spark.createDataFrame(
        [(i, [float((i * 3) % 7), float(i % 5), 1.0]) for i in range(60)],
        "id long, vec array<double>",
    )
    art = str(tmp_path / "norev_art")
    init_graph_artifact(base, art, M0=4, M1=2, buckets=8)
    shutil.rmtree(art + "/rev_edges")
    meta = _json.load(open(art + "/meta.json"))
    del meta["rev"]
    del meta["n_live"]  # r09 meta had neither
    _json.dump(meta, open(art + "/meta.json", "w"))

    batch = spark.createDataFrame(
        [(100, [1.0, 2.0, 3.0])], "id long, vec array<double>"
    )
    assert upsert_graph_artifact(batch, art, refresh_factor=10.0) == "upsert"
    vecs, edges, meta = load_graph_artifact(spark, art)
    assert vecs.count() == 61 and meta["rev"] is True
    assert meta["n_live"] == 61
    from vectordbindexing_spark.streaming.graph_ingest import (
        rev_edges_resolved,
    )

    got = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in rev_edges_resolved(spark, art).collect()
    )
    want = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in gi.edges_resolved(spark, art).collect()
    )
    assert got == want


def test_replay_noop_reads_only_the_batch_bucket_footprint(
    spark, corpus, tmp_path
):
    """The replay-detection scans (stored-id anti-join, stored-vector
    compare, adjacency probe) must partition-prune to the batch's own
    buckets — unpruned, a no-op replay pays full corpus scans, the
    exact classification regression this pins against. Corrupting the
    DATA region (footers left intact, so schema inference still works)
    of every vectors/edges parquet file OUTSIDE a one-id batch's
    footprint makes any unpruned scan throw; a clean "noop" proves the
    prune."""
    import glob
    import os

    from pyspark.sql import functions as SF

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "prune_art")
    init_graph_artifact(base, art, M0=M0, M1=M1, buckets=8)
    one = b1.limit(1).localCheckpoint(eager=True)
    assert upsert_graph_artifact(one, art, refresh_factor=10.0) == "upsert"

    keep_bkt = one.select(
        SF.pmod(SF.xxhash64(SF.col("id")), SF.lit(8)).cast("int")
    ).first()[0]
    corrupted = 0
    for sub in ("vectors", "edges"):
        for d in glob.glob(os.path.join(art, sub, "bucket=*")):
            if int(d.rsplit("=", 1)[1]) == keep_bkt:
                continue
            for f in glob.glob(os.path.join(d, "*.parquet")):
                size = os.path.getsize(f)
                if size < 2600:  # too small to corrupt clear of footer
                    continue
                with open(f, "r+b") as fh:  # zero data pages only
                    fh.seek(4)
                    fh.write(b"\x00" * (size - 2500))
                corrupted += 1
    assert corrupted >= 8  # the corpus really extends past the batch
    # sanity: an UNpruned read of a corrupted slice really does throw
    # (a real column read — count() alone is answered from footers)
    with pytest.raises(Exception):
        spark.read.parquet(art + "/vectors").agg(
            SF.sum("id")
        ).collect()

    assert upsert_graph_artifact(one, art, refresh_factor=10.0) == "noop"


def test_rev_delta_is_append_only_and_compaction_folds(
    spark, corpus, tmp_path, monkeypatch
):
    """An upsert must never rewrite a rev base bucket (that third
    dirty-fraction swap was the r10 write-amplification finding) —
    only d<seq> files appear under rev_delta/. Once the log outgrows
    the threshold, the NEXT upsert folds it back into the base and
    the resolved mirror is preserved throughout."""
    import glob
    import os

    import vectordbindexing_spark.streaming.graph_ingest as gi
    from vectordbindexing_spark.streaming.graph_ingest import (
        rev_edges_resolved,
    )

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "delta_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)
    base_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(art, "rev_edges", "**", "*.parquet"),
                           recursive=True)
    }
    assert upsert_graph_artifact(b1, art, refresh_factor=10.0) == "upsert"
    # base untouched, delta appended
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(art, "rev_edges", "**", "*.parquet"),
                           recursive=True)
    }
    assert after == base_files
    adds = glob.glob(os.path.join(art, "rev_delta", "adds", "**",
                                  "d1-*.parquet"), recursive=True)
    assert len(adds) > 0
    assert os.path.exists(
        os.path.join(art, "rev_delta", "tombs", "d1.parquet")
    )

    def fwd_rows():
        return sorted(
            (r["layer"], r["src"], r["dst"])
            for r in gi.edges_resolved(spark, art).collect()
        )

    def rev_rows():
        return sorted(
            (r["layer"], r["src"], r["dst"])
            for r in rev_edges_resolved(spark, art).collect()
        )

    assert fwd_rows() == rev_rows()

    # force the fold: threshold 0 -> the next upsert compacts FIRST
    monkeypatch.setattr(gi, "REV_COMPACT_FACTOR", 0.0)
    upd = spark.createDataFrame(
        [(5, [0.5] * D)], "id long, vec array<double>"
    )
    assert upsert_graph_artifact(upd, art, refresh_factor=10.0) == "upsert"
    # the fold consumed d1; the new batch appended d2 only
    assert not glob.glob(os.path.join(art, "rev_delta", "adds", "**",
                                      "d1-*.parquet"), recursive=True)
    assert glob.glob(os.path.join(art, "rev_delta", "adds", "**",
                                  "d2-*.parquet"), recursive=True)
    assert fwd_rows() == rev_rows()
    import json as _json

    meta = _json.load(open(art + "/meta.json"))
    assert meta["rev_seq"] == 2 and meta.get("pending") is None


def test_half_finished_compaction_is_exact_and_self_heals(
    spark, corpus, tmp_path, monkeypatch
):
    """Crash between the fold's base swap and the delta removal: the
    resolved view must stay exact (folded base rows keep their seq;
    leftover delta rows are identical payloads deduped on key), and
    the next upsert completes the fold."""
    import glob
    import os

    import vectordbindexing_spark.streaming.graph_ingest as gi
    from vectordbindexing_spark.streaming.graph_ingest import (
        rev_edges_resolved,
    )

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "halffold_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)
    assert upsert_graph_artifact(b1, art, refresh_factor=10.0) == "upsert"

    monkeypatch.setattr(gi, "REV_COMPACT_FACTOR", 0.0)
    real_clear = gi._clear_rev_delta
    calls = {"n": 0}

    def boom(index_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("simulated crash before the delta removal")
        return real_clear(index_dir)

    monkeypatch.setattr(gi, "_clear_rev_delta", boom)
    upd = spark.createDataFrame(
        [(5, [0.5] * D)], "id long, vec array<double>"
    )
    with pytest.raises(OSError):
        upsert_graph_artifact(upd, art, refresh_factor=10.0)

    # half-folded: base rewritten AND delta still present — resolution
    # must dedup to the exact mirror of the (untouched) forward edges
    assert glob.glob(os.path.join(art, "rev_delta", "adds", "**",
                                  "*.parquet"), recursive=True)
    fwd = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in gi.edges_resolved(spark, art).collect()
    )
    rev = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in rev_edges_resolved(spark, art).collect()
    )
    assert fwd == rev

    # next upsert re-folds (idempotent) and completes the batch
    assert upsert_graph_artifact(upd, art, refresh_factor=10.0) == "upsert"
    fwd = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in gi.edges_resolved(spark, art).collect()
    )
    rev = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in rev_edges_resolved(spark, art).collect()
    )
    assert fwd == rev


def test_crash_before_rev_delta_write_heals_on_replay(
    spark, corpus, tmp_path, monkeypatch
):
    """Vectors and forward edges committed, rev delta not: the replay
    must land on the pending-heal path, pre-clear this seq's files and
    restore the mirror."""
    import vectordbindexing_spark.streaming.graph_ingest as gi
    from vectordbindexing_spark.streaming.graph_ingest import (
        rev_edges_resolved,
    )

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "revcrash_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)

    def boom(*a, **kw):
        raise OSError("simulated crash before the rev delta write")

    monkeypatch.setattr(gi, "_write_rev_delta", boom)
    with pytest.raises(OSError):
        upsert_graph_artifact(b1, art, refresh_factor=10.0)
    monkeypatch.undo()

    assert upsert_graph_artifact(b1, art, refresh_factor=10.0) == "upsert"
    fwd = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in gi.edges_resolved(spark, art).collect()
    )
    rev = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in rev_edges_resolved(spark, art).collect()
    )
    assert fwd == rev
    assert upsert_graph_artifact(b1, art, refresh_factor=10.0) == "noop"


def test_pre_clear_rev_delta_removes_only_its_own_seq(tmp_path):
    """The replay pre-clear must match d<seq>.parquet and
    d<seq>-<i>.parquet EXACTLY — a bare d<seq>* pattern would also
    delete d<seq>0…'s files (seq 1 eating seq 10's delta)."""
    import os

    import vectordbindexing_spark.streaming.graph_ingest as gi

    adds = tmp_path / "rev_delta" / "adds" / "bucket=3"
    tombs = tmp_path / "rev_delta" / "tombs"
    adds.mkdir(parents=True)
    tombs.mkdir(parents=True)
    for n in [
        "d1.parquet", "d1-0.parquet", "d1-1.parquet",
        "d10.parquet", "d10-0.parquet", "d12-0.parquet",
    ]:
        (adds / n).write_bytes(b"x")
    (tombs / "d1.parquet").write_bytes(b"x")
    (tombs / "d10.parquet").write_bytes(b"x")

    # flat-layout files straight under adds/ must follow the same
    # exact-seq rule
    flat = tmp_path / "rev_delta" / "adds"
    for n in ["d1-0.parquet", "d10-0.parquet"]:
        (flat / n).write_bytes(b"x")

    gi._pre_clear_rev_delta(str(tmp_path), 1, [3, 99])  # 99: absent dir
    assert sorted(os.listdir(adds)) == [
        "d10-0.parquet", "d10.parquet", "d12-0.parquet"
    ]
    assert sorted(
        n for n in os.listdir(flat) if not n.startswith("bucket=")
    ) == ["d10-0.parquet"]
    assert sorted(os.listdir(tombs)) == ["d10.parquet"]


def test_write_rev_delta_moves_every_part_file(spark, tmp_path, monkeypatch):
    """If the flat delta write ever emits >1 part file (coalesce(1)
    made a no-op — AQE/config variation), every part must be moved
    into the log — dropping parts [1:] silently loses delta rows.
    Simulated by making coalesce a no-op so the 8 input partitions
    each write their own part file."""
    import os

    from pyspark.sql.classic.dataframe import DataFrame

    import vectordbindexing_spark.streaming.graph_ingest as gi

    adds = spark.createDataFrame(
        [(0, i, i % 5 + 100, 0.25) for i in range(64)],
        "layer int, src long, dst long, dist double",
    ).repartition(8).localCheckpoint(eager=True)
    dirty = spark.createDataFrame([(i,) for i in range(64)], "id long")

    monkeypatch.setattr(
        DataFrame, "coalesce", lambda self, *a, **kw: self
    )
    appended = gi._write_rev_delta(adds, dirty, str(tmp_path), 1, buckets=2)
    monkeypatch.undo()

    adds_dir = os.path.join(str(tmp_path), "rev_delta", "adds")
    import glob as _glob

    parts = _glob.glob(os.path.join(adds_dir, "d1-*.parquet"))
    assert len(parts) > 2  # the multi-part layout actually materialized
    got = spark.read.schema(gi.ADDS_SCHEMA).parquet(adds_dir)
    assert got.count() == 64
    assert appended > 0


def test_fwd_delta_is_append_only_serving_resolves_and_folds(
    spark, corpus, tmp_path, monkeypatch
):
    """An upsert must never rewrite a forward base bucket (r11
    measurement: the dirty-bucket swap rewrote 91% of the artifact per
    1000-node update at 2M — batch·2·M0 + losers srcs saturate any
    bucket count) — adds land in fwd_delta/, serving resolves
    base ∪ delta − tombstones, and the log folds back into the base
    past the threshold."""
    import glob
    import json as _json
    import os

    import vectordbindexing_spark.streaming.graph_ingest as gi

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "fwd_delta_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)
    base_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(art, "edges", "**", "*.parquet"),
                           recursive=True)
    }
    assert upsert_graph_artifact(b1, art, refresh_factor=10.0) == "upsert"
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(art, "edges", "**", "*.parquet"),
                           recursive=True)
    }
    assert after == base_files  # base untouched, delta appended
    assert glob.glob(os.path.join(art, "fwd_delta", "adds", "**",
                                  "d1-*.parquet"), recursive=True)
    assert os.path.exists(
        os.path.join(art, "fwd_delta", "tombs", "d1.parquet")
    )
    # serving reads the resolved view; inserted nodes are reachable
    vecs, edges, _ = load_graph_artifact(spark, art)
    gt1 = _gt(q, base.unionByName(b1))
    assert _recall(spark, q, vecs, edges, gt1) >= 0.8

    # force the fold: threshold 0 → the next upsert compacts FIRST
    monkeypatch.setattr(gi, "REV_COMPACT_FACTOR", 0.0)
    upd = spark.createDataFrame(
        [(5, [0.5] * D)], "id long, vec array<double>"
    )
    assert upsert_graph_artifact(upd, art, refresh_factor=10.0) == "upsert"
    monkeypatch.undo()
    assert not glob.glob(os.path.join(art, "fwd_delta", "adds", "**",
                                      "d1-*.parquet"), recursive=True)
    assert glob.glob(os.path.join(art, "fwd_delta", "adds", "**",
                                  "d2-*.parquet"), recursive=True)
    # the resolved forward view still mirrors the resolved inverse
    fwd = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in gi.edges_resolved(spark, art).collect()
    )
    rev = sorted(
        (r["layer"], r["src"], r["dst"])
        for r in gi.rev_edges_resolved(spark, art).collect()
    )
    assert fwd == rev
    meta = _json.load(open(art + "/meta.json"))
    assert meta.get("pending") is None
    assert meta["fwd_base_bytes"] > 0 and meta["fwd_delta_bytes"] > 0


def test_fwd_tombs_without_adds_serves_instead_of_throwing(
    spark, corpus, tmp_path
):
    """The fwd-delta crash window: _write_edge_delta moves the global
    tombstone file BEFORE the per-bucket adds, so a crash between the
    two (or a batch whose merged adjacency is empty) leaves
    fwd_delta/tombs populated with fwd_delta/adds absent. delta_empty
    is then False, and an unguarded adds read would throw
    PATH_NOT_FOUND on EVERY serving read until the batch replays —
    the resolved view must instead read the adds as empty and keep
    serving base − tombstoned srcs."""
    import shutil

    import vectordbindexing_spark.streaming.graph_ingest as gi

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "fwd_crash_art")
    init_graph_artifact(base, art, M0=M0, M1=M1)
    assert upsert_graph_artifact(b1, art, refresh_factor=10.0) == "upsert"

    fwd_adds, fwd_tombs = gi._fwd_delta_paths(art)
    tomb_srcs = {
        r["src"]
        for r in spark.read.parquet(fwd_tombs).select("src").collect()
    }
    assert tomb_srcs  # the window is only interesting with tombstones
    shutil.rmtree(fwd_adds)  # simulate: tombs moved, adds never landed

    fwd = gi.edges_resolved(spark, art)
    fwd_srcs = {r["src"] for r in fwd.select("src").distinct().collect()}
    # no throw, and every tombstoned src is masked (base rows are seq 0)
    assert not (fwd_srcs & tomb_srcs)
    base_srcs = {
        r["src"]
        for r in spark.read.parquet(art + "/edges")
        .select("src").distinct().collect()
    }
    assert fwd_srcs == base_srcs - tomb_srcs
    # the serving entry point reads the same resolved view
    vecs, edges, _ = load_graph_artifact(spark, art)
    assert edges.count() == fwd.count()


def _ivf_state(spark, art):
    import vectordbindexing_spark.streaming.graph_ingest as gi

    return {
        (r["id"], tuple(r["vec"]))
        for r in gi._ivf_live(spark, art).collect()
    }


def _vec_state(spark, art):
    return {
        (r["id"], tuple(float(x) for x in r["vec"]))
        for r in spark.read.parquet(art + "/vectors")
        .select("id", "vec").collect()
    }


def test_maintained_ivf_mirror_stays_in_sync_and_append_only(
    spark, corpus, tmp_path, monkeypatch
):
    """Past the exact limit the batch kNN reads the maintained IVF
    cells mirror instead of re-fitting/re-assigning the corpus per
    micro-batch (the r11 2M residual floor). The mirror must (a) be
    built at init when the corpus already exceeds the limit, (b) stay
    an exact resolved copy of the vectors artifact across inserts,
    updates and crash replays, (c) take batch rows as LSM delta
    appends — never a cell rewrite — and (d) fold back into its base
    past the threshold with state intact."""
    import glob
    import json as _json
    import os

    import vectordbindexing_spark.streaming.graph_ingest as gi

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "ivf_mirror")
    init_graph_artifact(base, art, M0=M0, M1=M1, exact_base_limit=100)
    meta = _json.load(open(art + "/meta.json"))
    assert meta["ivf"]["nlist"] >= 16 and meta["ivf"]["base_bytes"] > 0
    assert _ivf_state(spark, art) == _vec_state(spark, art)
    base_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(
            os.path.join(art, "ivf_cells", "**", "*.parquet"), recursive=True
        )
    }

    # insert batch: mirror follows, base cells untouched (append-only)
    assert (
        upsert_graph_artifact(
            b1, art, refresh_factor=10.0, exact_base_limit=100
        )
        == "upsert"
    )
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(
            os.path.join(art, "ivf_cells", "**", "*.parquet"), recursive=True
        )
    }
    assert after == base_files
    assert glob.glob(
        os.path.join(art, "ivf_delta", "adds", "**", "d1-*.parquet"),
        recursive=True,
    )
    assert _ivf_state(spark, art) == _vec_state(spark, art)

    # update batch (changed vector, likely a cell move): batch wins
    upd = spark.createDataFrame(
        [(7, [0.25] * D)], "id long, vec array<double>"
    )
    assert (
        upsert_graph_artifact(
            upd, art, refresh_factor=10.0, exact_base_limit=100
        )
        == "upsert"
    )
    assert _ivf_state(spark, art) == _vec_state(spark, art)

    # replay of a fully-committed batch: noop, mirror untouched
    pre = _ivf_state(spark, art)
    assert (
        upsert_graph_artifact(
            upd, art, refresh_factor=10.0, exact_base_limit=100
        )
        == "noop"
    )
    assert _ivf_state(spark, art) == pre

    # forced fold: delta subsumed into the base, state identical
    monkeypatch.setattr(gi, "REV_COMPACT_FACTOR", 0.0)
    upd2 = spark.createDataFrame(
        [(9, [0.75] * D)], "id long, vec array<double>"
    )
    assert (
        upsert_graph_artifact(
            upd2, art, refresh_factor=10.0, exact_base_limit=100
        )
        == "upsert"
    )
    monkeypatch.undo()
    assert not glob.glob(
        os.path.join(art, "ivf_delta", "adds", "**", "d1-*.parquet"),
        recursive=True,
    )
    assert _ivf_state(spark, art) == _vec_state(spark, art)


def test_ivf_mirror_crash_before_delta_append_heals_on_replay(
    spark, corpus, tmp_path, monkeypatch
):
    """Crash window: fwd/rev deltas landed but the IVF delta append
    never ran (ledger still pending). The replay must pre-clear and
    re-append so the mirror converges back to the vectors artifact."""
    import vectordbindexing_spark.streaming.graph_ingest as gi

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "ivf_crash")
    init_graph_artifact(base, art, M0=M0, M1=M1, exact_base_limit=100)

    real = gi._write_ivf_delta
    calls = {"n": 0}

    def boom(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("simulated crash before the IVF delta append")
        return real(*a, **kw)

    monkeypatch.setattr(gi, "_write_ivf_delta", boom)
    with pytest.raises(OSError):
        upsert_graph_artifact(
            b1, art, refresh_factor=10.0, exact_base_limit=100
        )
    # replay heals: pending ledger re-queues, mirror converges
    assert (
        upsert_graph_artifact(
            b1, art, refresh_factor=10.0, exact_base_limit=100
        )
        == "upsert"
    )
    monkeypatch.undo()
    assert _ivf_state(spark, art) == _vec_state(spark, art)
    # and serving still works over the healed artifact
    vecs, edges, _ = load_graph_artifact(spark, art)
    gt1 = _gt(q, base.unionByName(b1))
    assert _recall(spark, q, vecs, edges, gt1) >= 0.6


def test_legacy_per_bucket_delta_folds_away_and_appends_flat(
    spark, corpus, tmp_path, monkeypatch
):
    """Pre-r12 logs hold one adds file PER TOUCHED BUCKET — a listing
    cost that grows with batch count (measured at 2M: ~15k fwd + ~23k
    rev files PER 1000-row batch, ~10k-task scans after a handful of
    batches). The first upsert against such an artifact must fold the
    legacy log away (the fold IS the migration) and append flat
    bucket-sorted files from then on, with resolution unchanged."""
    import glob
    import os

    import vectordbindexing_spark.streaming.graph_ingest as gi

    full, base, b1, b2, q = corpus
    art = str(tmp_path / "legacy_art")
    init_graph_artifact(base, art, M0=M0, M1=M1, buckets=8)

    # a legacy-era batch: pin the writers into the per-bucket layout
    monkeypatch.setattr(gi, "_legacy_delta", lambda *a, **k: True)
    upsert_graph_artifact(b1, art)
    monkeypatch.undo()
    assert glob.glob(os.path.join(art, "rev_delta", "adds", "bucket=*"))
    assert glob.glob(os.path.join(art, "fwd_delta", "adds", "bucket=*"))
    n_legacy = gi.edges_resolved(spark, art).count()

    # the next upsert folds the legacy logs (migration) and its own
    # delta lands as flat files under adds/
    out = upsert_graph_artifact(b2, art)
    assert out == "upsert"
    for log in ("rev_delta", "fwd_delta"):
        assert not glob.glob(os.path.join(art, log, "adds", "bucket=*"))
        flat = glob.glob(os.path.join(art, log, "adds", "d*-*.parquet"))
        assert flat, f"{log}: no flat delta files appended"
    # resolution still serves the union state
    assert gi.edges_resolved(spark, art).count() > n_legacy
    vecs, edges, _ = load_graph_artifact(spark, art)
    gt = _gt(q, full)
    assert _recall(spark, q, vecs, edges, gt) >= 0.6
