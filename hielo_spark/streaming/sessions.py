"""Sessionization: gap-based user sessions over the events feed.

Batch form (`sessionize_batch`): lag + cumulative-sum session assignment —
two windows over one shuffle on user_id; DuckDB-oracle-checkable.

Streaming form (`sessionize_stream`): applyInPandasWithState keeps one
open session per user in GroupState with a processing-time timeout;
closed sessions are emitted as they complete. State is bounded by the
number of concurrently-active users.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql import Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_GAP_MS = 30 * 60 * 1000

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_id", LongType(), False),
        StructField("session_start", StringType(), False),
        StructField("session_end", StringType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType(), True),
        StructField("start_ms", LongType(), True),
        StructField("end_ms", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)


def sessionize_batch(events: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Batch sessionization: new session when the gap to the previous event
    exceeds gap_ms; session_id = running count of session starts."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    marked = events.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.withColumn("session_id", F.sum("new_sess").over(wsum))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def _fmt_ms(ms: int) -> str:
    import datetime as dt

    return dt.datetime.fromtimestamp(ms / 1000, dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_ms: int,
    use_timeout: bool = False,
    event_time: bool = False,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # flush the open session on inactivity timeout
        if state.exists:
            sid, start_ms, end_ms, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [[user_id, sid, _fmt_ms(start_ms), _fmt_ms(end_ms), n, round(total, 2)]],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )
        return

    if state.exists:
        sid, start_ms, end_ms, n, total = state.get
    else:
        sid, start_ms, end_ms, n, total = 0, None, None, 0, 0.0

    closed: list[list] = []
    # Concatenate ALL Arrow chunks before sorting: a group larger than
    # maxRecordsPerBatch arrives as several chunks, and sorting each chunk
    # independently would process events out of time order across chunk
    # boundaries (sessions merged/split differently from the batch twin).
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts_ms")
        for ts_ms, value in zip(pdf["ts_ms"], pdf["value"]):
            ts_ms = int(ts_ms)
            if start_ms is None:
                sid, start_ms, end_ms, n, total = sid + 1, ts_ms, ts_ms, 1, float(value)
            elif ts_ms - end_ms > gap_ms:
                closed.append([user_id, sid, _fmt_ms(start_ms), _fmt_ms(end_ms), n, round(total, 2)])
                sid, start_ms, end_ms, n, total = sid + 1, ts_ms, ts_ms, 1, float(value)
            else:
                end_ms, n, total = ts_ms, n + 1, total + float(value)

    state.update((sid, start_ms, end_ms, n, total))
    if event_time and end_ms is not None:
        # flush when the WATERMARK (not wall clock) passes the gap after
        # the session's last event — deterministic under replay
        state.setTimeoutTimestamp(end_ms + gap_ms)
    elif use_timeout:
        state.setTimeoutDuration(gap_ms)
    if closed:
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])


def sessionize_stream(
    events: DataFrame, gap_ms: int = SESSION_GAP_MS, idle_flush: bool = False
) -> DataFrame:
    """Stateful streaming sessionization. Emits a session once a newer
    event closes it (gap exceeded). One state entry per active user —
    bounded, shuffle keyed on user_id.

    ``idle_flush=True`` additionally closes sessions for users idle longer
    than gap_ms of processing time (long-running deployments). Off by
    default: with ``trigger(availableNow)`` a processing-time timeout makes
    the runner spin micro-batches waiting for wall-clock timeouts, which is
    wrong for drain-and-stop runs.
    """
    prepped = events.select(
        "user_id", F.unix_millis(F.col("ts")).alias("ts_ms"), "value"
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_flush else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _sessionize_group(key, pdfs, state, gap_ms, idle_flush),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def sessionize_stream_event_time(
    events: DataFrame, gap_ms: int = SESSION_GAP_MS, watermark: str = "1 minute"
) -> DataFrame:
    """Sessionization with an EVENT-TIME timeout: a session also closes
    when the stream's watermark passes ``last event + gap_ms`` — so idle
    users' sessions flush deterministically with the data, not with wall
    clock (replayable; correct under availableNow drains, where Spark's
    no-data micro-batch fires the timeouts after the last file).

    State remains one row per active user; the watermark additionally
    bounds how long an idle user's row can live.
    """
    prepped = (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", F.unix_millis(F.col("ts")).alias("ts_ms"), "value")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _sessionize_group(
            key, pdfs, state, gap_ms, event_time=True
        ),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
