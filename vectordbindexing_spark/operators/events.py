"""Event-stream batch analytics: tumbling-window aggregation and gap-based
sessionization. These are the batch twins of the Structured Streaming path
(vectordbindexing_spark.streaming) — identical column semantics, so a
stream job's output can be validated against these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_stats(events: DataFrame) -> DataFrame:
    """Per (event_type, hour) tumbling-window counts + value aggregates."""
    return (
        events.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time
    since the previous event exceeds ``gap_minutes``. Output per user:
    n_sessions, n_events, longest session length (events).

    Single shuffle on user_id; the lag/cumsum windows reuse that
    partitioning (no extra exchange).

    The gap uses ``timestampdiff`` over second-truncated endpoints so it
    works on both TIMESTAMP and TIMESTAMP_NTZ inputs — Spark 4 refuses
    ``TIMESTAMP_NTZ → BIGINT`` casts, and the driver's events parquet
    reads as NTZ — and is timezone-independent either way. The
    ``date_trunc`` matters: it reproduces epoch-floor boundary-count
    semantics (= DuckDB ``date_diff('second', ...)``), whereas a raw
    timestampdiff truncates the full microsecond difference and flips
    near-gap-threshold sessions.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(
        "timestampdiff(SECOND, date_trunc('second', _prev_ts),"
        " date_trunc('second', ts))"
    )
    flagged = events.withColumn("_prev_ts", F.lag("ts").over(w)).withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("sess_events")
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("sess_events").alias("n_events"),
            F.max("sess_events").alias("max_session_events"),
        )
    )


def sessionize_native(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """:func:`sessionize` through Spark's built-in ``session_window``
    aggregation — same output schema and (pinned by test) identical
    results. session_window merges an event into the open session when
    its timestamp is STRICTLY inside the previous event's window, so a
    window of ``gap·60 + 1`` seconds over second-truncated timestamps
    merges exactly when the whole-second gap is ≤ gap·60 — i.e. the
    lag formulation's "gap > threshold starts a new session" rule.
    The truncation is what makes the two rules coincide: on raw
    microsecond timestamps the boundary cases differ.

    Why keep both: this form is a single aggregation (no lag window)
    and is what Structured Streaming's watermarked session windows use,
    so batch and streaming sessionization share one code shape; the lag
    formulation exists because its unrolled-SQL oracle pins the exact
    session-boundary arithmetic cross-engine."""
    ts = F.date_trunc("second", F.col("ts").cast("timestamp"))
    per_sess = (
        events.withColumn("_ts", ts)
        .groupBy(
            "user_id",
            F.session_window("_ts", f"{gap_minutes * 60 + 1} seconds"),
        )
        .agg(F.count(F.lit(1)).alias("sess_events"))
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("sess_events").alias("n_events"),
        F.max("sess_events").alias("max_session_events"),
    )
