"""Deterministic random-walk corpus generation over an edge table —
the data-prep step of DeepWalk / node2vec (Perozzi KDD'14): emit
fixed-length walks from every node, to be fed to a sequence-embedding
trainer exactly like text. The LLM-pipeline angle: graph-structured
corpora (link graphs, co-citation, near-dup clusters) get "sentences"
this way.

Spark-first shape: walks advance in lockstep — step t is ONE
(node-key) join of the walk frontier against the indexed neighbor
table, so the whole corpus of walks costs walk_len joins total (the
pagerank/frontier iteration pattern, localCheckpoint per step), not
one traversal per walk. Neighbor choice is hash-deterministic
(md5(walk_id:step:node) mod degree over the dst-ordered neighbor
ranking) — reproducible across runs, partitionings and engines; the
DuckDB oracle (`oracles.random_walks_sql`) replays every step
bit-for-bit. No RNG state, no sampling drift: the "randomness" is the
same pseudo-uniform hash family every sampling operator in this repo
uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.hashing import det_hash64
from vectordbindexing_spark.operators.triangles import _symmetrize, _undirected


def random_walks(
    edges: DataFrame,
    walk_len: int = 8,
    walks_per_node: int = 1,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Hash-deterministic uniform random walks on the undirected simple
    graph of ``edges``: ``walks_per_node`` walks start at every node;
    step t moves to neighbor index md5(walk_id:t:node) mod degree (dst-
    ordered). Returns ``(walk_id, step, node)`` with steps 0..walk_len;
    walk_id = start_node · walks_per_node + w."""
    if walk_len < 1:
        raise ValueError("need walk_len >= 1")
    if walks_per_node < 1:
        raise ValueError("need walks_per_node >= 1")
    sym = _symmetrize(_undirected(edges, src_col, dst_col))
    w_u = Window.partitionBy("u")
    nbr = sym.select(
        "u",
        "v",
        F.row_number().over(w_u.orderBy("v")).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(w_u).cast("long").alias("deg"),
    ).localCheckpoint(eager=True)
    cur = (
        nbr.select("u").distinct()
        .crossJoin(
            F.broadcast(
                nbr.sparkSession.range(walks_per_node).select(
                    F.col("id").alias("_w")
                )
            )
        )
        .select(
            (F.col("u") * walks_per_node + F.col("_w")).alias("walk_id"),
            F.col("u").alias("node"),
        )
    )
    out = cur.select("walk_id", F.lit(0).cast("long").alias("step"), "node")
    for t in range(1, walk_len + 1):
        h = det_hash64(
            F.concat_ws(
                ":",
                F.col("walk_id").cast("string"),
                F.lit(str(t)),
                F.col("node").cast("string"),
            )
        )
        nxt = (
            cur.join(nbr, cur["node"] == nbr["u"])
            .where(F.col("rnk") == F.pmod(h, F.col("deg")) + 1)
            .select("walk_id", F.col("v").alias("node"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            nxt.select("walk_id", F.lit(t).cast("long").alias("step"), "node")
        )
        cur = nxt
    return out
