"""Maximal Marginal Relevance (MMR) re-ranking — the diversity pass a
vector-search deployment runs over its ANN shortlist (Carbonell &
Goldstein, SIGIR'98; the `diversify` option of Vespa/Weaviate/Qdrant).

score_MMR(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s): greedily
pick the candidate that is relevant AND far from everything already
picked. The reference engine's occlusion/diversify edge prune
(`operators.graph.diversify_edges`, hnsw.cpp neighbor-selection
heuristic) is the index-build twin of this serving-time operator.

Spark-first shape: MMR is inherently sequential IN ONE QUERY's
shortlist (selection t depends on 1..t−1) but embarrassingly parallel
ACROSS queries — exactly the applyInPandas contract. Each group is a
top-N shortlist (N ≈ 20–100 from the ANN route), so the per-group cost
is O(N·k·d) on a few dozen rows; at 100 TB the heavy work (retrieval)
stays in the distributed index and MMR only ever touches |q|·N rows.
This is the legitimate Pandas-UDF case the repo's no-Python-hot-path
rule carves out: semantics a join/window can't express, bounded input.

Cross-engine exactness (`oracles.mmr_rerank_sql` unrolls the k greedy
steps as CTEs): every arithmetic step shares one IEEE expression tree —
cosine similarity is the position-ordered sequential fold (numpy
``cumsum`` == DuckDB ``list_sum(list_transform(...))``), λ embeds as
the same python-repr literal, selection compares RAW doubles (ties by
lowest doc id; no rounding inside the loop — half-even python rounding
never runs), and the output score is rounded once, JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seq_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Left-to-right sequential dot (cumsum), matching DuckDB's
    list_sum over the elementwise-product list — NOT np.dot (pairwise
    BLAS accumulation differs in final ulps)."""
    p = a * b
    return float(np.cumsum(p)[-1]) if p.size else 0.0


def _cos_sim(a: np.ndarray, b: np.ndarray) -> float:
    num = _seq_dot(a, b)
    na = np.sqrt(_seq_dot(a, a))
    nb = np.sqrt(_seq_dot(b, b))
    return num / (na * nb)


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.5,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel",
    vec_col: str = "vec",
) -> DataFrame:
    """Greedy MMR over per-query candidate shortlists.

    ``candidates``: (query_id, doc_id, rel, vec) — rel is the
    retrieval relevance (higher = better; use the ROUNDED score of the
    upstream ranker so both engines see identical inputs), vec the
    candidate's embedding. Returns (query_id, rank, doc_id, mmr_score):
    rank 1 is argmax rel; rank t>1 maximizes
    λ·rel − (1−λ)·max_{selected} cos_sim, ties to the lowest doc id;
    mmr_score is the selection-time objective rounded to 6 dp.
    """
    if k < 1:
        raise ValueError("need k >= 1")
    lam_f = float(lam)

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        vecs = [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
        rels = pdf["rel"].to_numpy(dtype=np.float64)
        ids = pdf["doc_id"].to_numpy()
        n = len(pdf)
        remaining = list(range(n))
        sel: list[int] = []
        out_rows = []
        # max-sim of every remaining candidate to the selected set,
        # updated incrementally as selections land
        msim = np.full(n, -np.inf)
        for rank in range(1, min(k, n) + 1):
            best_i, best_score = None, None
            for i in remaining:
                if rank == 1:
                    score = rels[i]
                else:
                    score = lam_f * rels[i] - (1.0 - lam_f) * msim[i]
                # strict > keeps the lowest-doc_id winner (remaining is
                # doc_id-sorted)
                if best_score is None or score > best_score:
                    best_i, best_score = i, score
            sel.append(best_i)
            remaining.remove(best_i)
            out_rows.append(
                (int(pdf["query_id"].iloc[0]), rank, int(ids[best_i]),
                 float(best_score))
            )
            for i in remaining:
                s = _cos_sim(vecs[i], vecs[best_i])
                if s > msim[i]:
                    msim[i] = s
        return pd.DataFrame(
            out_rows, columns=["query_id", "rank", "doc_id", "mmr_score"]
        )

    prepped = candidates.select(
        F.col(query_col).cast("long").alias("query_id"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(rel_col).cast("double").alias("rel"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    reranked = prepped.groupBy("query_id").applyInPandas(
        _one, "query_id long, rank long, doc_id long, mmr_score double"
    )
    return reranked.select(
        "query_id", "rank", "doc_id", F.round("mmr_score", 6).alias("mmr_score")
    )
