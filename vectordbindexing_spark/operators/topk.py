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
    kernels: columns are reordered by ascending id, then each row takes
    a STABLE argsort — stable sort over id-ordered columns breaks every
    distance tie by the LOWEST id, the same (order_col, tie_col)
    convention :func:`topk_per_group` applies to the merged partials
    and the oracles' ``row_number() OVER (ORDER BY dist, id)``.

    An argpartition cut cannot honor that convention when the boundary
    lands inside a tie group: the kept/dropped tied candidates then
    depend on batch position, so the global merge sees a
    partitioning-dependent candidate set (reproduced on the BQ Hamming
    scan — integer distances tie constantly — where single-partition
    execution flipped 113/500 oracle rows). Cost is one O(n log n) row
    sort instead of O(n) selection; the distance matmul dominates every
    kernel that calls this.

    Returns (sel_ids, sel_dists), each (n_rows, kk).
    """
    order = np.argsort(ids, kind="stable")
    Do = D[:, order]
    sel = np.argsort(Do, axis=1, kind="stable")[:, :kk]
    return ids[order][sel], np.take_along_axis(Do, sel, axis=1)


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
