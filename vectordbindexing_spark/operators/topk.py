"""Per-group top-k — the engine's dominant operator (SURVEY §2.6).

The reference does argsort/argpartition (`roargraph_python.py:161-162`,
`hnsw_cosine.py:146-148`); here it is a rank window with a deterministic
(order_col, tie_col) sort so results are reproducible across engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def batch_topk_by_dist_id(D: np.ndarray, ids: np.ndarray, kk: int):
    """Exact per-batch top-``kk`` by (distance, id) for the Arrow scan
    kernels, breaking every distance tie by the LOWEST id — the same
    (order_col, tie_col) convention :func:`topk_per_group` applies to
    the merged partials and the oracles' ``row_number() OVER (ORDER BY
    dist, id)``.

    A bare argpartition cut cannot honor that convention when the
    boundary lands inside a tie group: the kept/dropped tied candidates
    then depend on batch position, so the global merge sees a
    partitioning-dependent candidate set (reproduced on the BQ Hamming
    scan — integer distances tie constantly — where single-partition
    execution flipped 113/500 oracle rows). The r05 fix full-sorted
    every row (O(n log n)); this is the exact O(n) hybrid: O(n)
    argpartition finds the boundary distance, every strict-inside entry
    is kept, boundary TIES are kept lowest-id-first (columns are
    id-ordered, so a row-major nonzero scan IS id order), and only the
    kk survivors are sorted. Same selection, same output order, no row
    sort — the selector runs on every Arrow batch of every compressed
    scan, and with integer metrics (BQ Hamming) the matmul no longer
    dwarfs it.

    Returns (sel_ids, sel_dists), each (n_rows, min(kk, n)).
    """
    order = np.argsort(ids, kind="stable")
    Do = D[:, order]
    n = Do.shape[1]
    if kk >= n:
        sel = np.argsort(Do, axis=1, kind="stable")
        return ids[order][sel], np.take_along_axis(Do, sel, axis=1)
    # boundary distance = the kk-th smallest per row (argpartition, O(n))
    part = np.argpartition(Do, kk - 1, axis=1)[:, :kk]
    b = np.take_along_axis(Do, part, axis=1).max(axis=1, keepdims=True)
    # keep all strictly-inside entries, then fill to kk with the
    # lowest-id boundary ties (cumsum over the tie mask ranks ties in
    # id order because the columns are id-ordered)
    strict = Do < b
    tie = Do == b
    need = kk - strict.sum(axis=1, keepdims=True)
    keep = strict | (tie & (np.cumsum(tie, axis=1) <= need))
    # exactly kk kept per row → row-major nonzero reshapes cleanly, in
    # id order within each row
    cols = np.nonzero(keep)[1].reshape(Do.shape[0], kk)
    vals = np.take_along_axis(Do, cols, axis=1)
    # final (dist, id) order: stable sort on dist keeps the ascending-id
    # column order within equal distances
    fin = np.argsort(vals, axis=1, kind="stable")
    sel = np.take_along_axis(cols, fin, axis=1)
    return ids[order][sel], np.take_along_axis(vals, fin, axis=1)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tie_col: str | None = None,
    rank_name: str = "nbr_rank",
    ascending: bool = True,
) -> DataFrame:
    """Keep the k smallest (or largest) rows per group, with rank column.

    Ties broken by ``tie_col`` so output is deterministic. Spark executes
    this as a partial sort per shuffle partition; at scale, make sure the
    upstream already reduced candidates per group (partial top-k in the
    kernels) so the window never sees unbounded groups.
    """
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    keys = [order] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(*group_cols).orderBy(*keys)
    return (
        df.withColumn(rank_name, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_name) <= k)
    )
