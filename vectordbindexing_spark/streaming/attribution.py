"""Stream-stream interval join: conversion attribution.

The one Structured Streaming join shape a real event pipeline needs and
the repo didn't yet exercise: two watermarked event streams joined on
user with a time-range condition — every conversion pairs with the
exposures that preceded it within ``max_delay``. Spark buffers each
side in watermark-bounded state and emits pairs as both sides arrive;
the time-range predicate is what lets it EVICT state (an equi-join
alone would buffer forever).

The same function serves batch frames: ``withWatermark`` only applies
to streaming inputs, and the join expression is identical — so the
batch run of the same data is the row-identical twin the tests (and the
DuckDB-oracle contract query) compare against.

At 100 TB-scale streams: state per side ≈ rate × (watermark + max_delay)
rows keyed by user_id — bounded by time, not corpus; the equi-key
(user_id) shuffles both sides once, and late rows beyond the watermark
drop deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_pairs(
    exposures: DataFrame,
    conversions: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """All (exposure, conversion) pairs of the same user with
    ``exposure.ts <= conversion.ts <= exposure.ts + max_delay``.

    Output: (user_id, exposure_id, conversion_id, exposure_ts,
    conversion_ts, delay_seconds). Works on streaming inputs (both
    sides watermarked, interval condition bounds the join state) and on
    batch inputs (same expressions; watermark skipped) — the streaming
    result over a replayed feed is row-identical to the batch result,
    which is what the contract query's oracle checks."""
    ts_type = dict(exposures.dtypes).get(ts_col, "timestamp")

    def side(df: DataFrame, prefix: str) -> DataFrame:
        out = df.select(
            F.col(user_col).cast("long").alias(f"{prefix}_user"),
            F.col(ts_col).cast("timestamp").alias(f"{prefix}_ts"),
            F.col(id_col).cast("long").alias(f"{prefix}_id"),
        )
        if out.isStreaming:
            out = out.withWatermark(f"{prefix}_ts", watermark)
        return out

    e = side(exposures, "exp")
    c = side(conversions, "conv")
    cond = (
        (e["exp_user"] == c["conv_user"])
        & (e["exp_ts"] <= c["conv_ts"])
        & (c["conv_ts"] <= e["exp_ts"] + F.expr(f"INTERVAL {max_delay}"))
    )
    return (
        e.join(c, cond, "inner")
        .select(
            F.col("exp_user").alias("user_id"),
            F.col("exp_id").alias("exposure_id"),
            F.col("conv_id").alias("conversion_id"),
            F.col("exp_ts").cast(ts_type).alias("exposure_ts"),
            F.col("conv_ts").cast(ts_type).alias("conversion_ts"),
            # integer seconds over second-truncated endpoints — the
            # boundary-count semantics DuckDB's date_diff('second', ...)
            # uses (same idiom as operators.events.sessionize), exact
            # and NTZ-tolerant in both engines
            F.expr(
                "timestampdiff(SECOND, date_trunc('second', exp_ts),"
                " date_trunc('second', conv_ts))"
            ).cast("long").alias("delay_seconds"),
        )
    )


def last_touch(pairs: DataFrame) -> DataFrame:
    """Last-touch attribution over :func:`attribution_pairs` output:
    each conversion keeps its latest preceding exposure (ties → lowest
    exposure_id — deterministic in both engines). Batch/finalized use —
    a per-conversion argmax needs complete pair sets, so in a streaming
    pipeline run it per micro-batch on closed windows or downstream of
    the pairs sink."""
    from pyspark.sql import Window

    w = Window.partitionBy("conversion_id").orderBy(
        F.col("delay_seconds").asc(), F.col("exposure_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
