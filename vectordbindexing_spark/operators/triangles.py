"""Triangle counting, clustering coefficients, and k-core decomposition
over edge tables — the graph-quality diagnostics of an ANN index.

The reference's graph analyses stop at degree statistics
(`roargraph_python.py` degree histograms; `hnsw_cosine.py` neighbor
lists); triangle density and coreness are the standard next step when
judging whether a proximity graph is navigable (high local clustering =
good greedy routing; a thin 2-core = disconnection risk — exactly the
pathology the r07 500k clustered-corpus cliff exposed).

Spark-first shapes:

* **Triangles — degree-oriented wedge join** (Suri & Vassilvitskii,
  WWW'11 "Counting triangles and the curse of the last reducer"): every
  undirected edge is oriented from its lower-(degree, id) endpoint to
  the higher one, so the oriented out-degree is O(√m) even for hub
  nodes; wedges (two out-edges of one node) are then closed by one
  equi-join against the oriented edge set. Three equi-join shuffles
  total, no node ever enumerates deg² pairs — the plan that survives a
  power-law 100 TB graph, where the naive adjacency self-join dies on
  the heaviest hub.
* **k-core — iterative peel** (Matula & Beck 1983): drop nodes with
  degree < k, recompute, repeat. Each round is one groupBy + two
  semi-joins keyed on node id (the frontier_knn / pagerank iteration
  pattern: localCheckpoint per round truncates lineage, one count()
  drives termination). Rounds are idempotent at the fixed point, so
  Spark's early-exit and the oracle's fixed unroll agree whenever the
  peel converges within the unrolled rounds.

Cross-engine exactness: everything is integer (edge sets, degrees,
triangle counts) until the single final clustering-coefficient division
(2T)/(d·(d−1)) — two exact integers through one IEEE divide, identical
in Spark and DuckDB (`oracles.triangle_counts_sql` / `kcore_sql`),
rounded to 6 dp at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Canonical simple undirected edge set: (a, b) with a < b, self-loops
    and nulls dropped, duplicates (either direction) collapsed."""
    s, d = F.col(src_col).cast("long"), F.col(dst_col).cast("long")
    return (
        edges.select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull()
               & (F.col("a") != F.col("b")))
        .distinct()
    )


def _symmetrize(und: DataFrame) -> DataFrame:
    """Both directions of a canonical undirected edge set: (u, v)."""
    return und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient.

    Input edges are treated as undirected (direction and any extra
    columns ignored; duplicates and self-loops dropped). Returns
    ``(id, degree, triangles, clustering)`` for every node, where
    ``clustering = 2·T / (degree·(degree−1))`` (0.0 when degree < 2),
    rounded to 6 dp.

    Degree-oriented algorithm — see module docstring; each wedge
    (u; v, w) is generated exactly once with rank(v) < rank(w) under
    rank(x) = (degree(x), x), and closed iff the oriented edge v→w
    exists, so every triangle is counted exactly once.
    """
    und = _undirected(edges, src_col, dst_col)
    sym = _symmetrize(und)
    deg = sym.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    # orient each edge toward the higher-(degree, id) endpoint, carrying
    # the destination's rank for the wedge ordering below
    da, db = deg.alias("da"), deg.alias("db")
    ranked = (
        und.join(da, und["a"] == F.col("da.id"))
        .join(db, und["b"] == F.col("db.id"))
        .select(
            "a", "b",
            F.col("da.degree").alias("dega"),
            F.col("db.degree").alias("degb"),
        )
    )
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias("ddeg"),
    ).localCheckpoint(eager=False)
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    wedges = e1.join(e2, F.col("e1.src") == F.col("e2.src")).where(
        (F.col("e1.ddeg") < F.col("e2.ddeg"))
        | ((F.col("e1.ddeg") == F.col("e2.ddeg"))
           & (F.col("e1.dst") < F.col("e2.dst")))
    ).select(
        F.col("e1.src").alias("tu"),
        F.col("e1.dst").alias("tv"),
        F.col("e2.dst").alias("tw"),
    )
    tri = wedges.join(
        e3,
        (F.col("tv") == F.col("e3.src")) & (F.col("tw") == F.col("e3.dst")),
        "left_semi",
    )
    corners = (
        tri.select(F.col("tu").alias("id"))
        .unionAll(tri.select(F.col("tv").alias("id")))
        .unionAll(tri.select(F.col("tw").alias("id")))
    )
    tcnt = corners.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("triangles")
    )
    out = deg.join(tcnt, "id", "left").select(
        "id",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias("triangles"),
    )
    two_t = (F.lit(2).cast("long") * F.col("triangles")).cast("double")
    denom = (F.col("degree") * (F.col("degree") - F.lit(1).cast("long"))).cast(
        "double"
    )
    return out.select(
        "id",
        "degree",
        "triangles",
        F.when(F.col("degree") >= 2, F.round(two_t / denom, 6))
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def kcore(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 16,
) -> DataFrame:
    """Nodes of the k-core (maximal subgraph with min degree ≥ k), with
    their degree inside the core: ``(id, core_degree)``.

    Iterative peel with early exit at the fixed point; because peeling
    is idempotent once stable, the result equals the oracle's fixed
    ``max_rounds`` unroll whenever convergence happens within
    ``max_rounds`` (asserted in tests at contract scale). Input treated
    as undirected simple graph, like :func:`triangle_counts`.
    """
    if k < 1:
        raise ValueError("need k >= 1")
    if max_rounds < 1:
        raise ValueError("need max_rounds >= 1")
    sym = _symmetrize(_undirected(edges, src_col, dst_col)).localCheckpoint(
        eager=True
    )
    n_prev = sym.count()
    for _ in range(max_rounds):
        keep = (
            sym.groupBy(F.col("u").alias("id"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= k)
            .select("id")
        )
        kept_u = sym.join(keep, F.col("u") == keep["id"], "left_semi")
        sym = kept_u.join(
            keep, F.col("v") == keep["id"], "left_semi"
        ).localCheckpoint(eager=True)
        n_now = sym.count()  # doubles as the checkpoint materializer
        if n_now == n_prev:
            break
        n_prev = n_now
    return sym.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )
