"""applyInPandasWithState sessionizer vs the batch sessionize twin.

The stateful query runs micro-batches continuously (processing-time
timeouts schedule empty batches), so the test polls the memory sink until
the emitted set stabilizes instead of processAllAvailable(). With a large
timeout, only gap-closed sessions emit — i.e. every session except each
user's final (still-open) one.
"""

import time

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    from vectordbindexing_spark.io.tables import load_table
    from vectordbindexing_spark.streaming.sessionize import sessionize_stream

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = sessionize_stream(stream, gap_minutes=30, timeout_ms=3_600_000)
    q = (
        out.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    prev, stable = -1, 0
    for _ in range(60):
        time.sleep(2)
        n = spark.sql("select count(*) from closed_sessions").collect()[0][0]
        if n == prev and n > 0:
            stable += 1
            if stable >= 3:
                break
        else:
            stable = 0
        prev = n
    q.stop()
    got = spark.sql("select * from closed_sessions").collect()
    assert got, "no closed sessions emitted"

    # batch truth: per-(user, session) event counts; drop each user's last
    # session (still open in the stream's state)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(
        "timestampdiff(SECOND, date_trunc('second', _prev_ts),"
        " date_trunc('second', ts))"
    )
    per_sess = (
        ev.withColumn("_prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess", F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sess_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w2 = Window.partitionBy("user_id").orderBy(F.col("sess_id").desc())
    closed = per_sess.withColumn("rk", F.row_number().over(w2)).filter("rk > 1")

    def counts(pairs):
        d = {}
        for k in pairs:
            d[k] = d.get(k, 0) + 1
        return d

    truth = counts(
        (r["user_id"], r["n_events"]) for r in closed.collect()
    )
    emitted = counts((r["user_id"], r["n_events"]) for r in got)
    assert emitted == truth
    assert all(r["session_end"] >= r["session_start"] for r in got)


def test_session_window_twin_matches_lag_formulation(spark, tables):
    """The built-in session_window formulation (gap·60+1 s over
    second-truncated ts) must reproduce the lag/cumsum sessionize
    row-for-row on the events fixture — including near-boundary gaps."""
    from vectordbindexing_spark.operators.events import (
        sessionize,
        sessionize_native,
    )

    ev = tables["events"]
    a = sorted(tuple(r) for r in sessionize(ev, gap_minutes=30).collect())
    b = sorted(tuple(r) for r in sessionize_native(ev, gap_minutes=30).collect())
    assert a == b
    # and at a tighter gap where many more boundaries are exercised
    a5 = sorted(tuple(r) for r in sessionize(ev, gap_minutes=5).collect())
    b5 = sorted(tuple(r) for r in sessionize_native(ev, gap_minutes=5).collect())
    assert a5 == b5
