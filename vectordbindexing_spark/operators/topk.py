"""Per-group top-k — the engine's dominant operator (SURVEY §2.6).

The reference does argsort/argpartition (`roargraph_python.py:161-162`,
`hnsw_cosine.py:146-148`); here it is a rank window with a deterministic
(order_col, tie_col) sort so results are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
