"""Custom stateful streaming operator: ordered first-touch funnel with
``applyInPandasWithState`` — the live twin of events.funnel_steps.

State design is the interesting part. The funnel recurrence is
sequential (step k's window opens at the step-(k-1) touch), so a
late-arriving EARLIER step-1 event can retroactively move every later
window — exact streaming funnels therefore need every event ever
seen, which is unbounded. This operator keeps a **K-minimum
timestamp sketch per step** (default K=32) and recomputes the chain
from the sketches on every update:

* step 1 is always exact (min of mins survives any truncation);
* step k is exact whenever fewer than K step-k events precede the
  final step-(k-1) touch — the discarded timestamps are all larger
  than the kept ones, so if ANY kept timestamp clears the window the
  minimum kept one is the true answer;
* beyond K per-step events the result degrades to "first touch among
  the K earliest" — a documented approximation, never a crash or
  unbounded state.

Output mode is update-shaped: a user's current funnel row is emitted
whenever a batch changes it (tests compare the LAST emission per user
against the batch operator). State is len(steps)·K longs per user.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _chain(mins: list[list[int]]) -> list[int | None]:
    """Recompute step timestamps from the per-step K-min lists."""
    out: list[int | None] = []
    prev: int | None = None
    for i, ts_list in enumerate(mins):
        if i == 0:
            cur = min(ts_list) if ts_list else None
        elif prev is None:
            cur = None
        else:
            after = [t for t in ts_list if t >= prev]
            cur = min(after) if after else None
        out.append(cur)
        prev = cur
    return out


def funnel_stream(
    events_stream: DataFrame,
    steps: list[str],
    k_state: int = 32,
) -> DataFrame:
    """events (user_id, event_type, ts) stream → per-user funnel rows
    (re-emitted whenever new events change them). Epoch-micros
    timestamps in the output for exact cross-run comparison."""
    if len(steps) < 2:
        raise ValueError("need at least 2 funnel steps")
    n = len(steps)
    out_cols = ", ".join(f"step_{i + 1}_us long" for i in range(n))
    # revision: monotone per-user emission counter — sinks don't
    # guarantee row order, so consumers pick max(revision) per user
    output_schema = f"user_id long, {out_cols}, completed long, revision long"
    state_schema = (
        ", ".join(f"s{i} array<long>" for i in range(n))
        + ", meta array<long>"
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            stored = state.get
            mins: list[list[int]] = [list(s) for s in stored[:n]]
            rev = int(stored[n][0])
        else:
            mins = [[] for _ in range(n)]
            rev = 0
        before = _chain(mins) if state.exists else [None] * n
        step_idx = {s: i for i, s in enumerate(steps)}
        for pdf in pdfs:
            for ty, t in zip(pdf["event_type"], pdf["ts"]):
                i = step_idx.get(ty)
                if i is None:
                    continue
                us = int(t.value // 1_000)  # pandas ns -> micros
                mins[i].append(us)
        mins = [sorted(set(m))[:k_state] for m in mins]
        after = _chain(mins)
        if after == before or after[0] is None:
            if any(mins):
                state.update(tuple(mins) + ([rev],))
            return
        rev += 1
        state.update(tuple(mins) + ([rev],))
        row = {"user_id": [user_id]}
        for i, v in enumerate(after):
            row[f"step_{i + 1}_us"] = [v]
        row["completed"] = [1 if after[-1] is not None else 0]
        row["revision"] = [rev]
        yield pd.DataFrame(row)

    return (
        events_stream.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
