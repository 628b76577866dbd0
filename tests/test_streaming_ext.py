"""Streaming dedup, event-time-timeout sessionization, and the cogroup
as-of join variant — parity against their batch/window twins."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from hielo_spark.io import load_table
from hielo_spark.streaming.events import (
    events_source_schema,
    normalize_events_ts,
    run_to_memory,
)


def _doubled_stream(spark, sf_dir, tmp_path):
    """A landing dir holding TWO copies of the events file — an
    at-least-once delivery twin (every record arrives twice)."""
    stage = str(tmp_path / "doubled")
    os.makedirs(stage, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    for name in ("a.parquet", "b.parquet"):
        dst = os.path.join(stage, name)
        if not os.path.exists(dst):
            os.symlink(src, dst)
    raw = (
        spark.readStream.schema(events_source_schema(spark, sf_dir))
        .format("parquet")
        .option("maxFilesPerTrigger", "1")  # the copies land in separate micro-batches
        .load(stage)
    )
    return normalize_events_ts(raw)


def test_streaming_dedup_collapses_redelivery(spark, sf_dir, tmp_path):
    from hielo_spark.streaming.dedup import dedup_stream

    # watermark horizon longer than the fixture's whole span: every
    # redelivered record is still inside the dedup state window
    deduped = dedup_stream(
        _doubled_stream(spark, sf_dir, tmp_path), watermark="3650 days"
    )
    run_to_memory(
        deduped.groupBy("event_type").agg(F.count("*").alias("n")),
        "dedup_stream_test",
        mode="complete",
    )
    got = {r.event_type: r.n for r in spark.table("dedup_stream_test").collect()}
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and sum(got.values()) > 0


def test_event_time_timeout_flushes_idle_sessions(spark, sf_dir):
    """With an event-time timeout, sessions whose gap elapsed before the
    final watermark are flushed by the no-data batch — so the stream
    emits MORE than the closed-by-a-newer-event set, and every emitted
    session must match the batch twin exactly."""
    from hielo_spark.streaming.events import read_events_stream
    from hielo_spark.streaming.sessions import (
        SESSION_GAP_MS,
        sessionize_batch,
        sessionize_stream,
        sessionize_stream_event_time,
    )

    run_to_memory(
        sessionize_stream_event_time(read_events_stream(spark, sf_dir)),
        "sessions_evtime_test",
        mode="append",
    )
    got = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.table("sessions_evtime_test").collect()
    }
    batch = sessionize_batch(load_table(spark, sf_dir, "events")).collect()
    all_batch = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events, r.total_value)
        for r in batch
    }
    assert got  # something flushed
    # every emitted session is a real batch session with identical stats
    assert all(got[k] == all_batch[k] for k in got)
    # and the timeout emitted strictly more than the closed-by-event set
    run_to_memory(
        sessionize_stream(read_events_stream(spark, sf_dir)),
        "sessions_noto_test",
        mode="append",
    )
    n_closed_by_event = spark.table("sessions_noto_test").count()
    assert len(got) > n_closed_by_event


def test_cogroup_asof_equals_window_asof(spark, sf_dir):
    from hielo_spark.operators.relational import asof_join, asof_join_cogroup

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("cval")
    )
    kw = dict(on="user_id", left_time="ts", right_time="ts", right_cols=["cval"])

    def canon(df):
        return sorted(
            (r.user_id, str(r.ts), round(r.value, 6),
             None if r.cval_right is None else round(r.cval_right, 6))
            for r in df.collect()
        )

    a = canon(asof_join(purchases, clicks, **kw))
    b = canon(asof_join_cogroup(purchases, clicks, **kw))
    assert a == b and len(a) > 0


def test_cogroup_asof_tolerance_and_empty_right(spark):
    from hielo_spark.operators.relational import asof_join_cogroup

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0), (2, "2024-01-01 10:00:00", 6.0)],
        ["user_id", "ts", "value"],
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 08:00:00", 1.0)], ["user_id", "ts", "rv"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.user_id: r.rv_right
        for r in asof_join_cogroup(
            left, right, "user_id", "ts", "ts", ["rv"], tolerance_ms=60 * 60 * 1000
        ).collect()
    }
    # user 1's only match is 2h old — outside the 1h tolerance;
    # user 2 has no right rows at all (empty-right group path)
    assert out == {1: None, 2: None}


def test_stream_stream_attribution_join_matches_batch(spark, sf_dir):
    from hielo_spark.streaming.events import read_events_stream
    from hielo_spark.streaming.joins import attribution_pairs

    ev_stream = read_events_stream(spark, sf_dir)
    pairs = attribution_pairs(
        ev_stream.filter(F.col("event_type") == "view"),
        ev_stream.filter(F.col("event_type") == "click"),
    )
    run_to_memory(pairs, "attr_join_test", mode="append")
    got = {
        (r.view_id, r.click_id, r.delay_us)
        for r in spark.table("attr_join_test").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.view_id, r.click_id, r.delay_us)
        for r in attribution_pairs(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "click"),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_foreachbatch_upsert_is_idempotent(spark, sf_dir, tmp_path):
    from hielo_spark.streaming.upsert import upsert_to_parquet

    # the doubled stream redelivers every record in a second micro-batch;
    # the anti-join upsert must keep exactly one copy per event_id
    stream = _doubled_stream(spark, sf_dir, tmp_path)
    sink = str(tmp_path / "upsert_sink")
    ckpt = str(tmp_path / "upsert_ckpt")
    q = upsert_to_parquet(stream, sink, "event_id", ckpt)
    q.awaitTermination()

    got = spark.read.parquet(sink)
    want = load_table(spark, sf_dir, "events")
    assert got.count() == want.count()
    assert got.select("event_id").distinct().count() == want.count()


def test_native_session_window_agrees_with_lag_cumsum(spark, sf_dir):
    """Spark's built-in session_window must produce the same sessions as
    the oracle-checked lag+cumsum implementation on the fixture (boundary
    semantics differ only for events exactly gap_ms apart, which the
    ns-grained fixture never produces)."""
    from hielo_spark.streaming.sessions import SESSION_GAP_MS, sessionize_batch

    ev = load_table(spark, sf_dir, "events")
    native = (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MS // 1000} seconds"))
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )
    ours = sessionize_batch(ev).select(
        "user_id", "session_start", "n_events", "total_value"
    )
    a = {tuple(r) for r in native.collect()}
    b = {tuple(r) for r in ours.collect()}
    assert a == b and len(a) > 0


def test_streaming_funnel_matches_batch(spark, sf_dir):
    """Every emitted funnel row (completed immediately, or flushed by the
    event-time timeout) must equal the batch per-user funnel reduction;
    completed funnels must be emitted for EXACTLY the batch's converted
    users (completion doesn't wait for the watermark)."""
    import pyspark.sql.functions as F

    from hielo_spark.queries.relational import _funnel_user_times
    from hielo_spark.streaming.events import read_events_stream
    from hielo_spark.streaming.funnel import funnel_stream

    run_to_memory(
        funnel_stream(read_events_stream(spark, sf_dir)), "funnel_stream_test",
        mode="append",
    )
    got = {
        r["user_id"]: (r["t0"], r["t1"], r["t2"], r["completed"])
        for r in spark.table("funnel_stream_test").collect()
    }
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    batch = {
        r["user_id"]: (r["t0"], r["t1"], r["t2"], r["t2"] is not None)
        for r in _funnel_user_times(spark, sf_dir)
        .select("user_id", fmt("t0").alias("t0"), fmt("t1").alias("t1"), fmt("t2").alias("t2"))
        .collect()
    }
    assert got and all(got[u] == batch[u] for u in got)
    # completed funnels emit data-driven, not watermark-driven: exact match
    want_completed = {u for u, v in batch.items() if v[3]}
    got_completed = {u for u, v in got.items() if v[3]}
    assert got_completed == want_completed and want_completed


class _FakeGroupState:
    """Just enough of pyspark GroupState to drive _funnel_group directly."""

    def __init__(self):
        self._value = None
        self.hasTimedOut = False
        self.timeout_ts = None
        self.removed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = tuple(v)
        self.removed = False

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def test_funnel_tombstone_absorbs_post_completion_events():
    """ADVICE r3: an event arriving after a funnel completed (still
    within the watermark) must NOT rebuild state and emit a second,
    partial row. Completion leaves a done-tombstone; stragglers are
    absorbed; the timeout GCs the tombstone silently."""
    import pandas as pd

    from hielo_spark.streaming.funnel import _funnel_group

    H = 1000
    state = _FakeGroupState()

    def invoke(rows):
        pdf = pd.DataFrame(rows, columns=["ts_ms", "event_type"])
        return list(_funnel_group((7,), iter([pdf]), state, H))

    # 1. completing batch → exactly one row, completed, tombstone kept
    out = invoke([(1000, "view"), (2000, "click"), (3000, "purchase")])
    assert len(out) == 1 and bool(out[0]["completed"][0])
    assert state.exists and state.get[4] is True
    assert state.timeout_ts == 3000 + H

    # 2. within-watermark straggler → absorbed, no second row
    out = invoke([(2500, "view")])
    assert out == []
    assert state.exists and state.get[4] is True

    # 3. timeout → tombstone GC'd silently (row already emitted)
    state.hasTimedOut = True
    out = list(_funnel_group((7,), iter([]), state, H))
    assert out == [] and not state.exists


def test_funnel_incomplete_flush_still_emits_once():
    """The event-time timeout still flushes INCOMPLETE funnels exactly
    once (tombstone change must not break the partial-row path)."""
    import pandas as pd

    from hielo_spark.streaming.funnel import _funnel_group

    state = _FakeGroupState()
    pdf = pd.DataFrame([(1000, "view"), (2000, "click")], columns=["ts_ms", "event_type"])
    assert list(_funnel_group((9,), iter([pdf]), state, 1000)) == []
    assert state.exists and state.get[4] is False

    state.hasTimedOut = True
    out = list(_funnel_group((9,), iter([]), state, 1000))
    assert len(out) == 1 and not bool(out[0]["completed"][0])
    assert not state.exists
