"""Custom stateful streaming operator: event-time sessionization with
``applyInPandasWithState``.

The reference has no streaming (SURVEY.md §2.10); this is the
north-rule "custom stateful operator" slot: per-user session windows
with a 30-minute inactivity gap, maintained as explicit GroupState so
a session can span many micro-batches. Semantics match the batch
``relational.event_sessions`` query (lag-gap + running sum) — the
equality of the two is the correctness test.

State per user: (open-session start epoch, last-seen epoch, events in
open session, closed-session count, total events). Sessions close when
the event-time watermark passes last_seen + gap; final per-user rows
are emitted on state timeout, so output arrives exactly once per user
once their activity quiesces (tests drive the stream to completion
with a far-future watermark flush batch).
"""

from __future__ import annotations

__all__ = ["sessionize_stream", "SESSION_GAP_S"]

SESSION_GAP_S = 1800

_STATE_SCHEMA = ("start_epoch double, last_epoch double, open_events long, "
                 "closed_sessions long, total_events long")
_OUT_SCHEMA = "user_id long, n_sessions long, n_events long"


def _update(key, pdfs, state):
    """GroupState update: fold this micro-batch's events (sorted by
    event time) into the per-user session accumulator; emit the final
    row only when the user times out (watermark passed gap)."""
    import pandas as pd

    if state.hasTimedOut:
        start, last, open_ev, closed, total = state.get
        n_sessions = closed + (1 if open_ev > 0 else 0)
        state.remove()
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_sessions": [n_sessions],
                            "n_events": [total]})
        return

    epochs: list[float] = []
    for pdf in pdfs:
        epochs.extend(float(t.timestamp()) for t in pdf["ts"])
    epochs.sort()
    if state.exists:
        start, last, open_ev, closed, total = state.get
    else:
        start = last = float("-inf")
        open_ev = closed = total = 0
    for e in epochs:
        if e - last > SESSION_GAP_S:
            if open_ev > 0:
                closed += 1
            start, open_ev = e, 0
        open_ev += 1
        total += 1
        last = max(last, e)
    state.update((start, last, open_ev, closed, total))
    # close the user once the watermark passes the inactivity gap
    state.setTimeoutTimestamp(int(last * 1000) + SESSION_GAP_S * 1000)
    yield pd.DataFrame({"user_id": [], "n_sessions": [], "n_events": []})


def sessionize_stream(events_stream_df, watermark: str = "30 minutes"):
    """events stream (user_id, ts, ...) → final per-user
    (user_id, n_sessions, n_events) rows, emitted on session timeout."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (events_stream_df
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _update,
                outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
