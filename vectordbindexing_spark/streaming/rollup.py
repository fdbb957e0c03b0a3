"""Streaming maintenance of the multi-resolution rollup ladder — the
continuous-aggregate half of events.multires_rollup.

The hour grain is a watermarked tumbling-window aggregate: append mode
emits each (event_type, hour) row exactly once, when the watermark
passes the hour's end — so the sink IS the hour table, maintained
incrementally with watermark-bounded state (state ≈ event types ×
hours inside the watermark horizon, independent of stream length).
Coarser grains never touch the raw stream: they re-aggregate the tiny
hour sink with the SAME events.coarsen_rollup the batch ladder uses,
which is what makes streamed and batch ladders row-identical (the
tests pin this with binary-exact values, where even the float sums
carry no rounding slack).

At 100 TB/day rates this is the only viable rollup shape: the raw
stream is touched once, per-hour state is bounded, and day/week are
O(hours) re-aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_stream(
    events: DataFrame, *, watermark: str = "2 hours", ts_col: str = "ts"
) -> DataFrame:
    """Hour-grain continuous aggregate of an event stream (or its
    batch twin — watermark is skipped on batch inputs, expressions
    identical): (event_type, bucket, n_events, sum_value), matching
    the hour rows of events.multires_rollup row-for-row."""
    from vectordbindexing_spark.operators.events import rollup_grain_aggs

    e = events
    if e.isStreaming:
        e = e.withWatermark(ts_col, watermark)
    return (
        e.groupBy("event_type", F.window(ts_col, "1 hour"))
        .agg(*rollup_grain_aggs())
        .select(
            "event_type",
            F.col("window.start").alias("bucket"),
            "n_events",
            "sum_value",
        )
    )
