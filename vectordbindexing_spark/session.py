"""SparkSession factory with scale-oriented defaults.

Local mode is only the test harness; the config choices (AQE, partition
sizing, Arrow batching) are the ones that matter on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vectordbindexing-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults follow ``SPARK_GRAFT_CPUS`` (driver contract) and size
    ``spark.sql.shuffle.partitions`` to the parallelism — on a real
    cluster this would be ~2-3x total cores and AQE coalesces down.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # local-mode driver == the only JVM; the 1g default heap GC-thrashes
        # once a session has run a few broadcast-heavy operators, while an
        # oversized heap (24g) measurably slows short jobs (lazy page
        # faults + GC geometry — measured 2.5x on IVF). 8g is the sweet
        # spot for the bench scale. Only effective if set before the JVM
        # launches (first getOrCreate).
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.cleaner.periodicGC.interval", "1min")
        # AQE: runtime coalescing, skew-join splitting, dynamic join strategy.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Arrow transfer for every pandas UDF / mapInPandas kernel.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # Vector tables are wide (array<float>); keep scan splits moderate.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # testdata events.parquet stores TIMESTAMP(NANOS); read as long and
        # normalize in io.tables (Spark has no ns timestamp type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
