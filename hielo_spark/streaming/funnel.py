"""Streaming funnel: per-user view → click → purchase state machine.

The batch twin is ``queries.relational._funnel_user_times`` (t0 = first
view, t1 = first click after it, t2 = first purchase after that). The
streaming form keeps exactly those three timestamps per user in
GroupState and processes events in event-time order, so the state after
a user's last event equals the batch reduction over the same events:

  * a COMPLETED funnel (t2 set) is emitted immediately; the state stays
    behind as a TOMBSTONE (``done`` flag) until the watermark passes
    ``last event + horizon``, absorbing any further within-watermark
    events for that user so a completed funnel can never emit a second,
    partial row — then the timeout removes it silently;
  * an INCOMPLETE funnel is flushed when the stream's watermark passes
    ``last event + horizon`` (event-time timeout — deterministic under
    replay and availableNow drains, same policy as
    sessions.sessionize_stream_event_time).

State is four longs + a flag per user active within the horizon —
bounded by concurrently-active users, independent of event volume.

Ordering contract: events are sorted by event time WITHIN each
invocation (all chunks of a micro-batch together), so the result equals
the batch twin when a user's events arrive in event-time order ACROSS
micro-batches. Within-watermark stragglers that land in a later
micro-batch out of order can still re-order the state machine's step
sequence relative to batch — the tombstone guarantees no duplicate
emission for completed funnels; for incomplete ones the flush-time
row reflects the as-arrived order.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FUNNEL_HORIZON_MS = 24 * 60 * 60 * 1000

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("t0", StringType(), True),
        StructField("t1", StringType(), True),
        StructField("t2", StringType(), True),
        StructField("completed", BooleanType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("t0_ms", LongType(), True),
        StructField("t1_ms", LongType(), True),
        StructField("t2_ms", LongType(), True),
        StructField("last_ms", LongType(), True),
        StructField("done", BooleanType(), True),
    ]
)


def _fmt_ms(ms: int | None) -> str | None:
    import datetime as dt

    if ms is None:
        return None
    return dt.datetime.fromtimestamp(ms / 1000, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _row(user_id: int, t0, t1, t2) -> pd.DataFrame:
    return pd.DataFrame(
        [[user_id, _fmt_ms(t0), _fmt_ms(t1), _fmt_ms(t2), t2 is not None]],
        columns=[f.name for f in FUNNEL_SCHEMA.fields],
    )


def _funnel_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    horizon_ms: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            t0, t1, t2, _last, done = state.get
            state.remove()
            if not done:
                # tombstones (done=True) already emitted at completion —
                # the timeout just garbage-collects them
                yield _row(user_id, t0, t1, t2)
        return

    t0 = t1 = t2 = last = None
    done = False
    if state.exists:
        t0, t1, t2, last, done = state.get

    if done:
        # completed-funnel tombstone: absorb post-completion events (a
        # within-watermark straggler must not rebuild state and emit a
        # second, partial row for an already-converted user). Drain the
        # iterator, keep the GC timeout as set at completion.
        for _ in batches:
            pass
        state.update((t0, t1, t2, last, True))
        state.setTimeoutTimestamp(last + horizon_ms)
        return

    # concat ALL chunks before sorting (multi-chunk groups must process in
    # global event-time order — same rule as sessions._sessionize_group)
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts_ms")
        for ts_ms, et in zip(pdf["ts_ms"], pdf["event_type"]):
            ts_ms = int(ts_ms)
            last = ts_ms if last is None else max(last, ts_ms)
            if et == "view" and t0 is None:
                t0 = ts_ms
            elif et == "click" and t0 is not None and t1 is None and ts_ms > t0:
                t1 = ts_ms
            elif et == "purchase" and t1 is not None and t2 is None and ts_ms > t1:
                t2 = ts_ms

    if t2 is not None:
        # funnel complete — emit now; leave a tombstone so later
        # within-watermark events for this user are absorbed, GC'd by
        # the event-time timeout
        state.update((t0, t1, t2, last, True))
        state.setTimeoutTimestamp(last + horizon_ms)
        yield _row(user_id, t0, t1, t2)
        return

    state.update((t0, t1, t2, last, False))
    if last is not None:
        state.setTimeoutTimestamp(last + horizon_ms)


def funnel_stream(
    events: DataFrame,
    horizon_ms: int = FUNNEL_HORIZON_MS,
    watermark: str = "1 minute",
) -> DataFrame:
    """Stateful streaming funnel over the events feed (ts already
    normalized to timestamp — use streaming.events.read_events_stream)."""
    prepped = (
        events.withWatermark("ts", watermark)
        .select(
            "user_id", "ts", F.unix_millis(F.col("ts")).alias("ts_ms"), "event_type"
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _funnel_group(key, pdfs, state, horizon_ms),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
