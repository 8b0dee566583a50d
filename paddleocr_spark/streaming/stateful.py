"""Custom stateful streaming operator: event-time sessionization with
``applyInPandasWithState``.

The reference has no streaming (SURVEY.md §2.10); this is the
north-rule "custom stateful operator" slot: per-user session windows
with a 30-minute inactivity gap, maintained as explicit GroupState so
a session can span many micro-batches. Semantics match the batch
``relational.event_sessions`` query (lag-gap + running sum) for EVERY
admissible arrival order — the equality of the two is the correctness
test.

Design: state per user is the set of NOT-YET-IMMUTABLE session
intervals ``(start, end, n_events)``. A session is immutable only once
the watermark passes ``end + gap`` — an earlier design that closed a
session as soon as a later event showed a large gap diverged from
batch on out-of-order arrivals (a late event can FILL the gap and
bridge two provisional sessions, so closing eagerly froze a split the
batch job never makes). Each arriving event merge-inserts into the
interval set (touching at most two intervals, which it bridges). The
final per-user row is emitted on state timeout, once the watermark
passes the last interval's ``end + gap`` — at that point every
interval is immutable and their count is exactly the batch
session count. State size is O(intervals still within the watermark
horizon), bounded by the user's activity span over the gap — the cost
of exact sessionization.

Append-mode caveat (inherent to streaming sessionization): a user who
resumes activity AFTER their timeout row was emitted starts fresh
state and eventually emits a second row; the batch twin, seeing all
data at once, emits one. The equality test drives the stream so no
user resumes post-timeout.

Epoch math assumes an UTC session (``pandas Timestamp.timestamp()``
treats naive wall time as UTC); ``sessionize_stream`` pins
``spark.sql.session.timeZone`` like the sibling relational operators,
so the GroupState timeout and Spark's watermark agree on any host.
"""

from __future__ import annotations

__all__ = ["sessionize_stream", "SESSION_GAP_S"]

SESSION_GAP_S = 1800

_STATE_SCHEMA = ("starts array<double>, ends array<double>, "
                 "counts array<long>")
_OUT_SCHEMA = "user_id long, n_sessions long, n_events long"


def _merge_insert(starts, ends, counts, e):
    """Insert event epoch ``e`` into the disjoint interval set; an
    event can touch at most two intervals (they are separated by more
    than the gap), bridging them into one."""
    lo, hi, cnt = e, e, 1
    ks, ke, kc = [], [], []
    for s0, e0, c0 in zip(starts, ends, counts):
        if s0 - SESSION_GAP_S <= e <= e0 + SESSION_GAP_S:
            lo, hi, cnt = min(lo, s0), max(hi, e0), cnt + c0
        else:
            ks.append(s0)
            ke.append(e0)
            kc.append(c0)
    import bisect

    i = bisect.bisect_left(ks, lo)
    ks.insert(i, lo)
    ke.insert(i, hi)
    kc.insert(i, cnt)
    return ks, ke, kc


def _update(key, pdfs, state):
    """GroupState update: merge-insert this micro-batch's events into
    the per-user interval set; emit the final row only when the user
    times out (watermark passed last end + gap)."""
    import pandas as pd

    if state.hasTimedOut:
        starts, ends, counts = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_sessions": [len(starts)],
                            "n_events": [int(sum(counts))]})
        return

    if state.exists:
        got = state.get
        starts, ends, counts = list(got[0]), list(got[1]), list(got[2])
    else:
        starts, ends, counts = [], [], []
    epochs: list[float] = []
    for pdf in pdfs:
        epochs.extend(float(t.timestamp()) for t in pdf["ts"])
    for e in sorted(epochs):
        starts, ends, counts = _merge_insert(starts, ends, counts, e)
    state.update((starts, ends, counts))
    # the user closes once the watermark passes the last inactivity gap
    state.setTimeoutTimestamp(int(max(ends) * 1000)
                              + SESSION_GAP_S * 1000)
    yield pd.DataFrame({"user_id": [], "n_sessions": [], "n_events": []})


def sessionize_stream(events_stream_df, watermark: str = "30 minutes"):
    """events stream (user_id, ts, ...) → final per-user
    (user_id, n_sessions, n_events) rows, emitted on session timeout."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    # the epoch arithmetic in _update requires UTC (see module doc)
    events_stream_df.sparkSession.conf.set(
        "spark.sql.session.timeZone", "UTC")
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
