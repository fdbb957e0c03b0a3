"""Deterministic cardinality sketches (HyperLogLog, Flajolet et al.
2007) — the 100 TB answer to COUNT(DISTINCT).

An exact distinct over a 100 TB column shuffles every distinct value;
the HLL register table is 2^p integers built by one map-side-combined
groupBy — constant-size state per executor, mergeable across
partitions/days/tables (max of registers), and the error is a known
1.04/√m. Unlike engine-native approx_count_distinct (whose hash and
merge order are implementation details), this sketch is built on the
repo's cross-engine md5 hash with pure integer arithmetic, so the
REGISTER TABLE ITSELF is bit-identical in Spark and DuckDB and the
oracle gate covers it exactly — determinism that also makes sketches
stored as artifacts diffable across engines and versions.

rho (leading-zero rank) uses length(bin(x)) — Spark and DuckDB agree
on bin() including bin(0)='0' — never float log2, whose libm ulp could
flip a register at a power-of-two boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from vectordbindexing_spark.plans.partitioning import local_rows_df

from vectordbindexing_spark.functions.hashing import det_hash60

HASH_BITS = 60


def hll_registers(
    df: DataFrame, col: str | Column, p: int = 10,
    group_col: str | None = None,
) -> DataFrame:
    """HLL register table: (group?, bucket, max_rho) over 2^p buckets —
    top p hash bits index, the rank of the highest set bit in the
    remaining 60-p bits is rho. Only observed buckets are emitted
    (absent bucket ⇔ register 0). Exact integers end-to-end; one
    groupBy. With ``group_col`` this is the per-slice COUNT(DISTINCT)
    table (distinct users per source/day/cohort) at 2^p integers per
    group — and slices merge upward (source→all) via
    :func:`merge_registers`, so one sketch pass serves every rollup."""
    if not 4 <= p <= 18:
        raise ValueError(f"p={p} outside [4, 18]")
    rest_bits = HASH_BITS - p
    c = F.col(col) if isinstance(col, str) else col
    h = det_hash60(c.cast("string"))
    idx = F.shiftright(h, rest_bits)
    rest = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + 1
    )
    keys = [group_col] if group_col else []
    return (
        df.filter(c.isNotNull())
        .select(
            *keys,
            idx.cast("long").alias("bucket"), rho.cast("long").alias("rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def merge_registers(*tables: DataFrame) -> DataFrame:
    """Union register tables from independent scans (days, shards,
    engines) — or from the groups of one grouped sketch — into one
    sketch: HLL's killer property at warehouse scale: pre-aggregate
    once per partition/slice, merge for any rollup."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))


def kmv_sketch(
    df: DataFrame,
    col: str | Column,
    k: int = 256,
    group_col: str | None = None,
) -> DataFrame:
    """KMV (k-minimum-values, Bar-Yossef et al. 2002) distinct sketch:
    the k smallest distinct 60-bit hash values — per group when
    ``group_col`` is given. Output (group?, rank, hval), exact integers.

    Why alongside HLL: KMV sketches COMPOSE under set operations — the
    union of two sketches is the k smallest of the merged values, and
    the Jaccard of two sources is estimable from the shared fraction of
    the union sketch (:func:`kmv_overlap`) — the corpus-overlap /
    cross-source-contamination question HLL registers cannot answer.
    One shuffle of (group, hash) pairs; the per-group top-k is the
    window-free sort-limit the engine partial-aggregates."""
    c = F.col(col) if isinstance(col, str) else col
    h = det_hash60(c.cast("string")).alias("hval")
    keys = [group_col] if group_col else []
    base = df.filter(c.isNotNull()).select(*keys, h).distinct()
    from pyspark.sql import Window

    if group_col:
        w = Window.partitionBy(group_col).orderBy("hval")
        return (
            base.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(group_col, F.col("rank").cast("long"), "hval")
        )
    # ungrouped: orderBy+limit is TakeOrdered (per-partition top-k +
    # driver merge, never a global sort); the rank window then runs
    # over only k rows
    top = base.orderBy("hval").limit(k)
    w = Window.orderBy("hval")
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("rank").cast("long"), "hval"
    )


def kmv_distinct_estimate(sketch_rows: list[int], k: int) -> float:
    """(k-1) * 2^60 / kth-min — the KMV estimator; exact count when the
    sketch is unsaturated (fewer than k distinct values)."""
    vals = sorted(sketch_rows)
    if len(vals) < k:
        return float(len(vals))
    return (k - 1) * float(1 << HASH_BITS) / float(vals[k - 1])


def kmv_overlap(a: list[int], b: list[int], k: int) -> float:
    """Jaccard estimate from two KMV sketches: the shared fraction of
    the k smallest values of their union (exact set algebra on exact
    integers — engine-independent by construction)."""
    sa, sb = set(a), set(b)
    union_k = sorted(sa | sb)[:k]
    if not union_k:
        return 0.0
    inter = sum(1 for v in union_k if v in sa and v in sb)
    return inter / len(union_k)


def cms_counters(
    df: DataFrame, col: str | Column, *, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch counter table (Cormode & Muthukrishnan 2005):
    (sketch_row, bucket, cnt) over ``depth`` independent hash rows of
    ``width`` buckets — the mergeable answer to per-key frequency at
    100 TB. Counting every token exactly shuffles one row per DISTINCT
    key; the CMS shuffles at most depth×width counters per partition
    after map-side combine, regardless of vocabulary size, and two
    sketches merge by adding counters (:func:`cms_merge`).

    Row j's hash is det_hash60 of ``"j|" || value`` — the row index is
    a digit prefix, so rows are independent permutations of the same
    md5 family and the counter table is bit-identical in DuckDB
    (the oracle gate covers the sketch itself, like hll_registers).
    Estimates (:func:`cms_estimate`) are min over rows — always ≥ the
    true count, never under (the CMS guarantee)."""
    if depth < 1 or width < 2:
        raise ValueError(f"depth={depth}, width={width} out of range")
    c = F.col(col) if isinstance(col, str) else col
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)]))
    e = df.filter(c.isNotNull()).select(
        c.cast("string").alias("v"), rows.alias("sketch_row")
    )
    bucket = det_hash60(
        F.concat_ws("|", F.col("sketch_row").cast("string"), F.col("v"))
    ) % width
    return (
        e.select(
            F.col("sketch_row").cast("long").alias("sketch_row"),
            bucket.cast("long").alias("bucket"),
        )
        .groupBy("sketch_row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Counters from independent scans add — the sketch of the union."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("sketch_row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    counters: DataFrame, items: DataFrame, col: str, *,
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each row of ``items``: min over the
    depth rows of the addressed counters (absent counter ⇔ 0). The
    counter table is tiny (≤ depth×width) — broadcast it."""
    from pyspark.sql.functions import broadcast

    c = F.col(col)
    # NULLs never entered the sketch; without this filter concat_ws
    # drops the NULL and the probe would hash the bare row salt,
    # attributing an arbitrary bucket's count to a NULL key
    probes = items.filter(c.isNotNull()).select(
        c.alias(col),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("sketch_row"),
    ).withColumn(
        "bucket",
        (det_hash60(
            F.concat_ws("|", F.col("sketch_row").cast("string"),
                        c.cast("string"))
        ) % width).cast("long"),
    )
    joined = probes.join(
        broadcast(counters), ["sketch_row", "bucket"], "left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(col).agg(
        F.min("cnt").cast("long").alias("est_count")
    )


def log_histogram(
    df: DataFrame, col: str | Column, *, scale: int = 1000
) -> DataFrame:
    """DDSketch-flavoured quantile sketch with γ=2 on fixed-point
    values: bucket = sign-aware bit-length of round(value·scale),
    count per bucket. Constant-size mergeable state (≤ ~128 buckets
    for doubles), relative error bounded by the bucket ratio — the
    scale answer to percentile-over-100-TB, where an exact percentile
    needs a global sort. Bucketing is PURE INTEGER (length(bin(n)),
    the proven-cross-engine rho trick from hll_registers) — never
    float log2, whose libm ulp flips buckets at power-of-two
    boundaries. value·scale is one IEEE multiply and round-half-away,
    both bit-identical in Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    v = F.round(c * F.lit(float(scale)), 0).cast("long")
    bucket = (
        F.when(v == 0, F.lit(0))
        .when(v > 0, F.length(F.bin(v)))
        .otherwise(-F.length(F.bin(-v)))
    )
    return (
        df.filter(c.isNotNull())
        .select(bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def log_histogram_quantiles(
    df: DataFrame, col: str | Column, qs: list[float], *, scale: int = 1000
) -> DataFrame:
    """Quantile estimates from the log-histogram: the q-th item's
    bucket by integer cumulative count, estimate = the bucket's
    midpoint value (exact binary integers divided once by scale).
    The bucket table is ≤ ~128 rows, so the window cumsum is free;
    everything upstream of it is one map-side-combined groupBy."""
    from pyspark.sql import Window

    hist = log_histogram(df, col, scale=scale)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy())
    )
    qdf = local_rows_df(
        cum.sparkSession, [(float(q),) for q in qs], "q double"
    )
    # target rank = ceil(q * total); first bucket with cum >= target
    pairs = qdf.crossJoin(cum).withColumn(
        "target", F.ceil(F.col("q") * F.col("total")).cast("long")
    ).filter(F.col("cum") >= F.col("target"))
    pick = pairs.groupBy("q", "total").agg(F.min("bucket").alias("bucket"))
    b = F.col("bucket")
    # midpoint of [2^(b-1), 2^b - 1] (positive); mirrored for negative.
    # F.shiftleft needs a literal shift count, so SQL exprs (1L base —
    # an int base would wrap at shift >= 32)
    mid_pos = F.expr(
        "(shiftleft(1L, cast(bucket - 1 as int))"
        " + shiftleft(1L, cast(bucket as int)) - 1) / 2.0"
    )
    mid_neg = F.expr(
        "-((shiftleft(1L, cast(-bucket - 1 as int))"
        " + shiftleft(1L, cast(-bucket as int)) - 1) / 2.0)"
    )
    est = (
        F.when(b == 0, F.lit(0.0))
        .when(b > 0, mid_pos)
        .otherwise(mid_neg)
    ) / F.lit(float(scale))
    return pick.select(
        F.col("q"),
        b.cast("long").alias("bucket"),
        F.round(est, 6).alias("est_value"),
        F.col("total").cast("long").alias("n_total"),
    )


def hll_estimate(df: DataFrame, col: str | Column, p: int = 10) -> DataFrame:
    """Single-row distinct-count estimate from the register table, with
    the standard small-range linear-counting correction. The float
    harmonic sum folds in bucket order (deterministic summation); all
    inputs to it are exact integers."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, col, p)
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", "max_rho"))),
            F.lit(0.0),
            lambda acc, x: acc + F.pow(F.lit(2.0), -x["max_rho"].cast("double")),
        ).alias("_hsum"),
    )
    v = F.lit(m) - F.col("n_obs")  # zero registers
    denom = F.col("_hsum") + v.cast("double")  # absent register adds 2^0
    raw = F.lit(alpha * m * m) / denom
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        v.cast("long").alias("zero_registers"),
        F.round(est, 6).alias("distinct_estimate"),
    )


def bloom_bits(
    df: DataFrame, col: str | Column, *, m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> DataFrame:
    """Deterministic Bloom filter as a sorted DISTINCT bit-position
    table — the persistable, mergeable (union = OR), cross-engine-
    diffable form of the runtime join filter. Spark's own
    spark.sql.optimizer.runtime.bloomFilter does this transiently
    inside one query; materializing the bits as a table is what lets
    a 100 TB pipeline build the filter once (e.g. "customers active
    this week") and prune many later fact scans with a broadcast
    membership probe (:func:`bloom_might_contain`) — no false
    negatives ever, false positives ≈ (1-e^{-kn/m})^k.

    Hash j of value v is det_hash60('j|'||v) % m_bits — same row-salt
    family as the count-min rows, integer end-to-end, so the bit table
    itself is oracle-gateable."""
    c = F.col(col) if isinstance(col, str) else col
    e = df.filter(c.isNotNull()).select(
        c.cast("string").alias("v"),
        F.explode(F.array(*[F.lit(j) for j in range(k_hashes)])).alias("j"),
    )
    bit = det_hash60(
        F.concat_ws("|", F.col("j").cast("string"), F.col("v"))
    ) % m_bits
    return e.select(bit.cast("long").alias("bit")).distinct()


def bloom_might_contain(
    bits: DataFrame, probe: DataFrame, col: str, *, m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> DataFrame:
    """Keys of ``probe`` that pass the filter (all k bits set). The
    bit table is at most m_bits rows — broadcast it; the probe side
    never shuffles. Guaranteed superset of the true member set."""
    from pyspark.sql.functions import broadcast

    c = F.col(col)
    keys = probe.select(c.alias(col)).filter(c.isNotNull()).distinct()
    e = keys.select(
        col,
        F.explode(F.array(*[F.lit(j) for j in range(k_hashes)])).alias("j"),
    )
    bit = det_hash60(
        F.concat_ws("|", F.col("j").cast("string"), c.cast("string"))
    ) % m_bits
    hits = (
        e.withColumn("bit", bit.cast("long"))
        .join(broadcast(bits), "bit", "inner")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == k_hashes)
        .select(col)
    )
    return hits


def kmv_pairwise_overlap(
    df: DataFrame, col: str | Column, group_col: str, k: int = 64
) -> DataFrame:
    """Pairwise Jaccard estimates between ALL groups from their KMV
    sketches — the cross-source contamination matrix. Each group
    contributes only its k-minimum hash values, so the pairwise stage
    works on |groups|·k rows no matter how big the corpus: per pair,
    the k smallest of the merged sketch values estimate the union, and
    the shared fraction estimates Jaccard (exact integer set algebra —
    :func:`kmv_overlap` is the python twin). Output
    (group_a, group_b, n_union, n_shared, jaccard), group_a < group_b.
    """
    # the sketch is |groups|·k rows but its lineage scans the whole
    # corpus; it feeds 5 sibling subplans below (a/b/groups/pairs×2),
    # and Spark re-executes narrow lineages per sibling — checkpoint
    # the tiny table so the corpus is scanned exactly once
    sk = kmv_sketch(df, col, k=k, group_col=group_col).localCheckpoint()
    a = sk.select(
        F.col(group_col).alias("group_a"), F.col("hval"),
        F.lit(1).alias("_in_a"), F.lit(0).alias("_in_b"),
    )
    b = sk.select(
        F.col(group_col).alias("group_b"), F.col("hval"),
        F.lit(0).alias("_in_a"), F.lit(1).alias("_in_b"),
    )
    groups = sk.select(F.col(group_col).alias("g")).distinct()
    pairs = (
        groups.select(F.col("g").alias("group_a"))
        .join(groups.select(F.col("g").alias("group_b")))
        .filter(F.col("group_a") < F.col("group_b"))
    )
    vals = (
        pairs.join(a, "group_a")
        .unionByName(pairs.join(b, "group_b"))
        .groupBy("group_a", "group_b", "hval")
        .agg(F.max("_in_a").alias("_in_a"), F.max("_in_b").alias("_in_b"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("group_a", "group_b").orderBy("hval")
    topk = vals.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k
    )
    return topk.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_union"),
        F.count(F.when((F.col("_in_a") == 1) & (F.col("_in_b") == 1), 1))
        .cast("long").alias("n_shared"),
        F.round(
            F.count(
                F.when((F.col("_in_a") == 1) & (F.col("_in_b") == 1), 1)
            ).cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("jaccard"),
    )
