"""vectordbindexing_spark — a PySpark-native vector-analytics engine.

A from-scratch, Spark-first reimplementation of the query/data-processing
capabilities of the reference repo ``wangpeipei90/vectordbindexing``
(ANN indexing over dense float vectors: exact/LSH/graph KNN, RoarGraph-style
projection graphs, whitening preprocessing, recall evaluation), plus the
LLM-data-pipeline operators a 100 TB corpus needs (dedup, similarity
search, multimodal columns, text analysis).

Everything is declared with the DataFrame API so Catalyst picks physical
plans; Python only runs inside Arrow-batched pandas UDFs for the numpy
kernels (batch distance matmul, top-k argpartition, occlusion prune).
"""

__version__ = "0.1.0"

from vectordbindexing_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
