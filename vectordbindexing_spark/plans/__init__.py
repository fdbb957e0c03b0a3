from vectordbindexing_spark.plans.partitioning import repartition_for_compute

__all__ = ["repartition_for_compute"]
