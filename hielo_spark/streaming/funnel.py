"""Streaming funnel: per-user view → click → purchase state machine.

The batch twin is ``queries.relational._funnel_user_times`` (t0 = first
view, t1 = first click after it, t2 = first purchase after that). The
streaming form keeps exactly those three timestamps per user in
GroupState and processes events in event-time order, so the state after
a user's last event equals the batch reduction over the same events:

  * a COMPLETED funnel (t2 set) is emitted immediately and its state
    dropped — conversion latency is one micro-batch, and completed users
    cost no further memory;
  * an INCOMPLETE funnel is flushed when the stream's watermark passes
    ``last event + horizon`` (event-time timeout — deterministic under
    replay and availableNow drains, same policy as
    sessions.sessionize_stream_event_time).

State is three longs per active user — bounded by concurrently-active
users, independent of event volume.
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
            t0, t1, t2, _last = state.get
            state.remove()
            yield _row(user_id, t0, t1, t2)
        return

    t0 = t1 = t2 = last = None
    if state.exists:
        t0, t1, t2, last = state.get

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
        # funnel complete — emit now, free the state
        if state.exists:
            state.remove()
        yield _row(user_id, t0, t1, t2)
        return

    state.update((t0, t1, t2, last))
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
