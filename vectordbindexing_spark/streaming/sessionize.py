"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the Structured Streaming twin of
operators.events.sessionize (same gap rule), demonstrating per-key state
(open-session tracking) with timeout-based emission.

Emits one row per CLOSED session: (user_id, session_start, session_end,
n_events). A session closes when a new event arrives more than
``gap_minutes`` after the last one (emitted immediately), or when the
processing-time timeout fires with no new data.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
STATE_SCHEMA = "start long, last long, n long"


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    timeout_ms: int = 60_000,
) -> DataFrame:
    """events (user_id, ts, ...) stream → closed-session stream."""
    gap_s = gap_minutes * 60

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                rows.append((user_id, start, last, n))
                state.remove()
        else:
            ts_all = []
            for pdf in pdfs:
                # epoch seconds, floor — same arithmetic as the batch op
                ts_all.extend(
                    int(t.value // 1_000_000_000) for t in pdf["ts"]
                )
            ts_all.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = None, None, 0
            for t in ts_all:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_s:
                    rows.append((user_id, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            if start is not None:
                state.update((start, last, n))
                state.setTimeoutDuration(timeout_ms)
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "session_start": pd.to_datetime(
                        [r[1] for r in rows], unit="s"
                    ),
                    "session_end": pd.to_datetime([r[2] for r in rows], unit="s"),
                    "n_events": [r[3] for r in rows],
                }
            )

    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
