"""Physical-layout helpers.

Compute-dense Arrow kernels (distance matmuls, hashing, whitening) are
CPU-bound per row: their parallelism is the number of input partitions, not
the data volume. A small-but-dense table read from one parquet file arrives
as ONE partition and would pin a single core; widen it first. (On a real
cluster the same applies per-executor — the 200 MB embedding shard that is
one HDFS block still wants cores × partitions.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def local_rows_df(spark, rows, schema) -> DataFrame:
    """Driver-local rows as a JVM-backed relation (guide §4: keep the
    Python boundary out of the plan).

    ``spark.createDataFrame(list)`` parks the rows in a pickled Python
    RDD under the plan, so EVERY downstream action touching the frame
    round-trips through Python workers — measured 2–9 s of fixed
    latency per action at local[32] for a 5,000-row relation, paid
    again on each re-execution (the unpickle is part of the lineage).
    Routing the same rows through pandas + Arrow converts ONCE,
    driver-side, and leaves a JVM-only scan in the plan: the same
    tiny parquet write dropped 6.4 s → 1.5 s. The maintainers build
    several such frames per micro-batch, which made this the dominant
    fixed cost of every streaming upsert.

    Values land bit-identically either way (Arrow casts to the declared
    types exactly as the pickle path's JVM coercion does); if pandas/
    Arrow cannot express the schema the conversion raises before any
    plan exists and the plain path is used unchanged."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd
        from pyspark.sql.types import StructType, _parse_datatype_string

        st = (
            schema
            if isinstance(schema, StructType)
            else _parse_datatype_string(schema)
        )
        pdf = pd.DataFrame(rows, columns=st.fieldNames())
        return spark.createDataFrame(pdf, schema=st)
    except Exception:
        return spark.createDataFrame(rows, schema)


def repartition_for_compute(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition iff the DataFrame has fewer partitions than
    the session's default parallelism (no-op otherwise — don't add a
    shuffle the layout doesn't need)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        # JVM-side physical-RDD probe: same partition count as
        # ``df.rdd`` (the Python conversion is a 1:1 map) without
        # building the Python-serializer RDD wrapper, which costs
        # 0.5-1.2 s of driver time PER FRESH PLAN (measured; the
        # wrapped RDD is cached so only repeat probes were free) —
        # and this helper runs in front of every blocked kernel.
        n_parts = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:  # non-classic backends: the public route
        n_parts = df.rdd.getNumPartitions()
    if n_parts >= target:
        return df
    return df.repartition(target)


def hash_ordered_sample(
    df: DataFrame,
    sample_size: int,
    id_col: str = "id",
    vec_col: str = "vec",
):
    """The bounded deterministic fit-sample shared by every codebook /
    centroid trainer (kmeans/IVF/PQ/OPQ): the ``sample_size`` rows with
    the smallest (det_hash64(id), id) — engine-independent, TWO jobs
    (one count to size the hash cutoff + one bounded take; the skew
    fallback re-takes but has never fired), and at n ≤ sample_size the
    sample IS the corpus (what makes the sf-scale oracles exact).
    Returns a pandas DataFrame (i, v).

    Scale guard: a bare ``orderBy(hash).limit(K).toPandas()`` executes
    as TakeOrdered, which ships min(K, partition rows) from EVERY
    partition to the driver — at 2M rows × 472 partitions that was the
    whole corpus and blew spark.driver.maxResultSize (measured, r11).
    Pre-filtering to hashes below ~1.3·K/n of the 32-bit range bounds
    the driver transfer at ~1.3·K rows; the final ordered limit still
    selects the exact K smallest hashes, so the sample — and every
    centroid/codebook/oracle derived from it — is bit-identical to the
    unfiltered take.
    """
    from vectordbindexing_spark.functions.hashing import det_hash64

    src = (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("i"),
            F.col(vec_col).alias("v"),
            det_hash64(
                F.col(id_col).cast("long").cast("string")
            ).alias("_h"),
        )
    )
    n = src.count()
    if n > sample_size:
        cut = int(min(1.0, 1.3 * sample_size / n) * (1 << 32))
        cand = src.where(F.col("_h") < cut)
        pdf = cand.orderBy("_h", "i").limit(sample_size).drop("_h").toPandas()
        if len(pdf) < sample_size:
            # pathological hash skew (never observed): exact fallback —
            # shortfall is detected from the take itself, not a count job
            pdf = src.orderBy("_h", "i").limit(sample_size).drop("_h").toPandas()
        return pdf
    return src.orderBy("_h", "i").limit(sample_size).drop("_h").toPandas()


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when AQE's skew splitting can't help (e.g.
    one key holds >1 partition-budget of rows on BOTH sides is not the
    case here — ``other`` must be the replicable side).

    The skewed side gets a deterministic salt derived from xxhash64 of
    ALL its columns (content-derived → stable across retries, unlike
    rand()); ``other`` is replicated ``num_salts``× via an exploded
    literal range. The join key becomes (on, salt), splitting one hot
    key's rows across ``num_salts`` tasks. Cost: |other| × num_salts rows
    through the exchange — size num_salts to the observed skew, and
    prefer plain AQE first.

    Only ``inner``/``left``/``left_semi``/``left_anti`` are allowed: those
    equal the unsalted join because output rows come from the skewed side
    (each appears under exactly one salt, and ``other`` carries every key
    under every salt). Right/full-outer would emit each unmatched
    ``other`` row ``num_salts`` times (it exists once per salt but matches
    none) — rejected.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi",
        "left_anti", "leftanti", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}) would duplicate unmatched rows of "
            f"the replicated side; use one of {sorted(allowed)}"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts)
    ).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<int>")),
    )
    out = left.join(right, [on, "_salt"], how)
    return out.drop("_salt")
