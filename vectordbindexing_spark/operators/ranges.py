"""Bucketized range join — the generic point-in-interval primitive.

A naive `point BETWEEN start AND end` join with no equi-key gives
Spark a BroadcastNestedLoopJoin: O(|points|·|intervals|) compares,
the classic 100 TB cliff. The scale-correct plan discretizes time
into fixed buckets: every interval explodes into the buckets it
covers (≤ len/bucket + 1 rows — bounded when intervals are bounded),
points map to one bucket each, and the candidate join is an
EQUI-join on the bucket id followed by the exact BETWEEN filter.
This is the same trick Databricks' range-join optimization and
PostGIS grid indexes use; pick ``bucket_seconds`` near the median
interval length to balance duplication against candidate width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 600,
    how: str = "inner",
) -> DataFrame:
    """Rows (point..., interval...) for every point inside
    [start, end] (inclusive both ends). ``how='left'`` keeps
    unmatched points with NULL interval columns. Interval columns
    keep their names — they must not collide with point columns."""
    dup = set(points.columns) & set(intervals.columns)
    if dup:
        raise ValueError(f"column collision between sides: {sorted(dup)}")
    b = bucket_seconds * 1_000_000  # epoch micros per bucket
    # integer `div`, never float division: epoch-micros quotients at
    # FP precision can floor to the wrong bucket at boundaries
    # cast covers TIMESTAMP_NTZ inputs (unix_micros wants LTZ); the
    # bucket ids only need to be consistent across the two sides
    p = points.withColumn(
        "_pb", F.expr(f"unix_micros(cast({point_col} as timestamp)) div {b}")
    )
    # Spark sequence(a, b) DESCENDS for b < a (it would silently
    # fabricate buckets for inverted intervals) — drop them instead
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    iv = intervals.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.expr(
                    f"unix_micros(cast({start_col} as timestamp)) div {b}"
                ),
                F.expr(
                    f"unix_micros(cast({end_col} as timestamp)) div {b}"
                ),
            )
        ),
    )
    cond = (F.col("_pb") == F.col("_ib")) & (
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r} not supported (inner|left)")
    # one join either way: a point has exactly ONE bucket, so left
    # outer emits a single NULL-padded row per unmatched point — no
    # second anti-join pass over both sides needed
    return p.join(iv, cond, how).drop("_pb", "_ib")
