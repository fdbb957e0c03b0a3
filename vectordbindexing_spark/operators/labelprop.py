"""Semi-supervised label propagation over an edge table — spread a
sparse label set (quality tiers, topic tags, spam flags) through a
similarity graph (Zhu & Ghahramani 2002; Raghavan 2007 for the mode
update). The LLM-pipeline use: label 1% of a corpus by hand, build the
kNN/near-dup graph the engine already serves, and propagate — cheap
weak supervision for quality filtering.

Synchronous, CLAMPED, fixed-round variant — chosen so the operator is
deterministic and oracle-replayable:

* seeds never change (clamped semi-supervised LP);
* round t: every non-seed node takes the MODE of its neighbors'
  round-(t−1) labels, ties to the SMALLEST label, keeping its previous
  label when no neighbor is labeled — integer counts, integer argmax,
  zero float anywhere;
* a fixed round count (default 3), never run-to-convergence: the
  DuckDB oracle (`oracles.label_propagation_sql`) unrolls the same
  rounds as MATERIALIZED CTEs (each round is referenced twice —
  un-materialized inlining would double the base scan per round).

Spark shape per round: one edges⨝labels join on the src key, one
(dst, label) count groupBy, one per-dst argmax window — the pagerank /
frontier_knn iteration pattern with localCheckpoint truncating lineage.
All shuffles key on node id; a 1000-executor run scales with |E|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordbindexing_spark.operators.triangles import _symmetrize, _undirected


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Propagate ``seeds`` (id, label) over the undirected simple graph
    of ``edges`` for ``iters`` synchronous rounds. Returns
    ``(id, label, is_seed)`` for every node of the graph; nodes never
    reached keep label −1. Seeds are clamped; see module docstring for
    the exact update rule."""
    if iters < 1:
        raise ValueError("need iters >= 1")
    sym = _symmetrize(_undirected(edges, src_col, dst_col)).localCheckpoint(
        eager=True
    )
    nodes = sym.select(F.col("u").alias("id")).distinct()
    seed = seeds.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(label_col).cast("long").alias("seed_label"),
    ).where(F.col("seed_label").isNotNull())
    cur = (
        nodes.join(seed, "id", "left")
        .select(
            "id",
            F.col("seed_label"),
            F.coalesce(F.col("seed_label"), F.lit(-1).cast("long")).alias(
                "label"
            ),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        nbr = (
            sym.join(cur.where(F.col("label") >= 0), sym["v"] == F.col("id"))
            .select(sym["u"].alias("nid"), F.col("label").alias("nlabel"))
        )
        cnt = nbr.groupBy("nid", "nlabel").agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.partitionBy("nid").orderBy(
            F.col("c").desc(), F.col("nlabel")
        )
        mode = (
            cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("nid").alias("id"), F.col("nlabel").alias("mode_l"))
        )
        cur = (
            cur.join(mode, "id", "left")
            .select(
                "id",
                "seed_label",
                F.coalesce(
                    F.col("seed_label"),  # clamped
                    F.col("mode_l"),      # neighbor mode
                    F.col("label"),       # keep previous (incl. -1)
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return cur.select(
        "id",
        "label",
        F.col("seed_label").isNotNull().cast("int").cast("long").alias(
            "is_seed"
        ),
    )
