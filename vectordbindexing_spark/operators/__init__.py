from vectordbindexing_spark.operators.exact_knn import exact_knn
from vectordbindexing_spark.operators.topk import topk_per_group

__all__ = ["exact_knn", "topk_per_group"]
