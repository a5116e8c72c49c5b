"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the Structured Streaming surface for
operators the built-in windowed aggregations can't express).

Semantics match the batch ``text_analysis.sessionize_events``
(gaps-and-islands: a session ends after ``gap`` minutes of silence),
so the batch query is the oracle twin for the streaming operator.

State per user: (session_start, last_ts, n_events) as epoch seconds.
Sessions close in two ways:
  * in-batch: a new event arrives more than ``gap`` after the last —
    the old session is emitted immediately;
  * by timeout: the event-time watermark passes last_ts + gap with no
    new events — Spark invokes the function with hasTimedOut and the
    session is emitted from state.
State is bounded by the number of OPEN sessions (one row per active
user), and the watermark timeout guarantees eviction — no unbounded
state at 100 TB/day event rates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", LongType()),  # epoch seconds
    StructField("session_end", LongType()),
    StructField("n_events", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("session_start", LongType()),
    StructField("last_ts", LongType()),
    StructField("n_events", LongType()),
])


def _make_fn(gap_s: int):
    def fn(key, pdfs, state: GroupState):
        uid = key[0]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [uid], "session_start": [start],
                                "session_end": [last], "n_events": [n]})
            return
        ts = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf["ts"])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        out = []
        if last is not None:
            # Late-but-admitted events older than the open session's
            # start: merge NEWEST-FIRST so a chain of late events
            # ([..., 930, 965] against start=1000, gap=60) walks back
            # into the open session together — ascending one-at-a-time
            # processing would break the chain at the oldest event and
            # emit sessions the batch oracle doesn't have.
            old = [t for t in ts if t < start]
            ts = [t for t in ts if t >= start]
            too_old = []
            for t in reversed(old):
                if start - t <= gap_s:
                    start = t
                    n += 1
                else:
                    too_old.append(t)
            # events that cannot reach the open session belong to
            # sessions already closed; gaps-and-islands them among
            # THEMSELVES (the batch semantics for that span) instead
            # of emitting one singleton each
            too_old.reverse()
            s0 = e0 = c0 = None
            for t in too_old:
                if s0 is None:
                    s0, e0, c0 = t, t, 1
                elif t - e0 > gap_s:
                    out.append((uid, s0, e0, c0))
                    s0, e0, c0 = t, t, 1
                else:
                    e0, c0 = t, c0 + 1
            if s0 is not None:
                out.append((uid, s0, e0, c0))
        for t in ts:
            if last is None:
                start = last = t
                n = 1
            elif t > last:
                if t - last > gap_s:
                    out.append((uid, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last = t
                    n += 1
            else:
                n += 1  # falls inside the open session's [start, last]
        state.update((start, last, n))
        # evict when the event-time watermark passes last + gap. Spark
        # rejects a timeout at-or-before the current watermark (e.g. a
        # batch of late-but-admitted events, or gap smaller than the
        # watermark delay) — clamp to watermark + 1ms so the state
        # times out on the next watermark advance instead of crashing.
        state.setTimeoutTimestamp(max((last + gap_s) * 1000,
                                      state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "session_start",
                                             "session_end", "n_events"])

    return fn


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      ts_col: str = "event_ts",
                      user_col: str = "user_id",
                      watermark: str = "1 minute") -> DataFrame:
    """events: streaming DF with (user_id, event_ts timestamp).
    Returns the stream of CLOSED sessions
    (user_id, session_start, session_end, n_events; epoch seconds)."""
    gap_s = gap_minutes * 60
    prepared = (events
                .withWatermark(ts_col, watermark)
                .select(F.col(user_col).cast("long").alias("user_id"),
                        F.col(ts_col).alias("event_time"),
                        F.unix_timestamp(F.col(ts_col)).alias("ts")))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_fn(gap_s), OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
