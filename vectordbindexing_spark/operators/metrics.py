"""Evaluation operators (SURVEY §2.11): recall@k, percentiles.

Reference impls: `roargraph_python.py:451-458` (÷k), `hnsw.cpp:830-851`,
`hnsw_methods_comparison.ipynb` calculate_recall_at_k (÷|gt|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(
    pred: DataFrame,
    truth: DataFrame,
    k: int,
    id_col: str = "qid",
    pred_col: str = "pred_ids",
    truth_col: str = "gt_ids",
    divide_by_gt: bool = False,
) -> DataFrame:
    """Per-query and mean recall@k from two (qid, array<id>) tables.

    ``divide_by_gt=False`` matches roargraph_python.py:451-458 (÷k);
    ``True`` matches the notebook variant (÷|gt|).
    """
    joined = pred.join(truth, id_col)
    hits = F.size(
        F.array_intersect(F.slice(pred_col, 1, k), F.slice(truth_col, 1, k))
    ).cast("double")
    denom = (
        F.least(F.size(F.slice(truth_col, 1, k)), F.lit(k)).cast("double")
        if divide_by_gt
        else F.lit(float(k))
    )
    return joined.select(F.col(id_col), (hits / denom).alias("recall"))


def mean_recall_at_k(pred: DataFrame, truth: DataFrame, k: int, **kw) -> float:
    row = (
        recall_at_k(pred, truth, k, **kw)
        .agg(F.avg("recall").alias("mean_recall"))
        .collect()[0]
    )
    return float(row["mean_recall"])


def percentiles(
    df: DataFrame, value_col: str, probs: list[float] = (0.1, 0.5, 0.9, 0.99)
) -> DataFrame:
    """P10..P99 summary (reference: np.percentile in hnsw_baseline_analysis)."""
    aggs = [F.avg(value_col).alias("mean"), F.stddev(value_col).alias("std")]
    aggs += [
        F.percentile_approx(value_col, float(p), 10_000).alias(f"p{int(p * 100)}")
        for p in probs
    ]
    return df.agg(*aggs)
