from vectordbindexing_spark.functions.vector import (
    METRICS,
    cosine_dist,
    dot,
    ip_dist,
    l2_dist,
    l2_norm,
    metric_dist,
    to_double_array,
    unit_norm,
)

__all__ = [
    "METRICS",
    "cosine_dist",
    "dot",
    "ip_dist",
    "l2_dist",
    "l2_norm",
    "metric_dist",
    "to_double_array",
    "unit_norm",
]
