"""Streaming → Iceberg-table sink through the no-jar commit plane.

``writeStream.format('iceberg')`` needs the Iceberg runtime jar (absent
here, verified r1-r4); the same capability falls out of composing
foreachBatch with ``metadata/commit.append``: every micro-batch becomes a
real Iceberg snapshot (data files + manifest + manifest-list +
metadata.json bump), so the table's history IS the stream's batch
timeline, time-travelable per batch.

Exactly-once: Structured Streaming replays a batch when a failure lands
between the sink's side effect and the checkpoint commit. Each snapshot
records its ``(query-id, batch-id)`` in the snapshot summary; a replayed
batch finds the marker in the table metadata and skips — the same
idempotent-commit trick Iceberg's own streaming writer uses (it stores
the batch id in snapshot properties). The check is a metadata read
(planning plane), not a data scan, unlike the key-anti-join upsert sink
(streaming/upsert.py) which exists for formats with no commit metadata.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def committed_state(table_dir: str, query_id: str) -> tuple[int, set[int]]:
    """``(hwm, summary_ids)`` for ``query_id``: the table-property
    high-water mark ``streaming.<qid>.last-batch-id`` (-1 when absent)
    plus the per-snapshot summary markers. Batches commit in order, so
    the mark covers every id at or below it — returned AS the scalar,
    never expanded into a set (a long-lived stream's hwm is in the
    millions; materializing ``range(hwm+1)`` per micro-batch would be
    O(hwm) time/memory for a membership check). The property survives
    ``expire_snapshots`` (which drops old snapshot entries and their
    summaries), so a checkpoint wipe after maintenance still cannot
    replay expired batches. One JSON read — planning plane."""
    from ..metadata.commit import current_metadata_path

    mpath = current_metadata_path(table_dir)
    if mpath is None:
        return -1, set()
    with open(mpath) as f:
        doc = json.load(f)
    summary_ids = set()
    for s in doc.get("snapshots", []):
        summ = s.get("summary", {})
        if summ.get("streaming-query-id") == query_id and "streaming-batch-id" in summ:
            summary_ids.add(int(summ["streaming-batch-id"]))
    hwm = doc.get("properties", {}).get(f"streaming.{query_id}.last-batch-id")
    return (int(hwm) if hwm is not None else -1), summary_ids


def is_batch_committed(table_dir: str, query_id: str, batch_id: int) -> bool:
    """Membership check against the hwm + summary markers without ever
    expanding the hwm range."""
    hwm, summary_ids = committed_state(table_dir, query_id)
    return batch_id <= hwm or batch_id in summary_ids


def committed_batch_ids(table_dir: str, query_id: str) -> set[int]:
    """Materialized id set — kept for tests/introspection on SHORT
    histories; sinks use :func:`is_batch_committed` (O(1) in hwm)."""
    hwm, summary_ids = committed_state(table_dir, query_id)
    summary_ids.update(range(hwm + 1))
    return summary_ids


def append_stream_to_table(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    query_name: str = "iceberg_append",
):
    """Start a foreachBatch writer committing each micro-batch as an
    append snapshot. Returns the StreamingQuery (caller awaits
    termination). Replayed batches are skipped via the summary marker +
    the expiry-proof table-property high-water mark.

    ``query_name`` is the marker NAMESPACE and must be unique per
    logical stream writing this table: two different streams sharing a
    name would treat each other's batch ids as already-committed and
    silently drop data."""
    from ..metadata.commit import append

    def _commit(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        qid = query_name  # stable across restarts (query.id changes with checkpoint wipes)
        if is_batch_committed(table_dir, qid, batch_id):
            return  # replayed batch — already a snapshot
        if batch.isEmpty():
            return
        append(
            spark,
            table_dir,
            batch,
            partition_by=partition_by,
            extra_summary={
                "streaming-query-id": qid,
                "streaming-batch-id": str(batch_id),
            },
            extra_properties={
                f"streaming.{qid}.last-batch-id": str(batch_id),
            },
        )

    return (
        stream_df.writeStream.foreachBatch(_commit)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def upsert_stream_to_table(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint: str,
    on: list[str],
    query_name: str = "iceberg_upsert",
):
    """CDC-style streaming upsert: every micro-batch becomes ONE
    merge-on-read MERGE snapshot (``metadata/commit.merge_into`` —
    matched keys updated, new keys inserted, atomically). Within a
    batch, duplicate keys collapse via ``dropDuplicates(on)`` (add a
    version column upstream and pre-aggregate if last-write-wins
    ordering matters). The first batch on a fresh table is a plain
    append. Exactly-once via the same ``(query-id, batch-id)`` summary
    markers as ``append_stream_to_table``."""
    from ..metadata.commit import append, current_metadata_path, merge_into

    def _commit(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        qid = query_name
        if is_batch_committed(table_dir, qid, batch_id):
            return
        if batch.isEmpty():
            return
        batch = batch.dropDuplicates(on)
        markers = {
            "streaming-query-id": qid,
            "streaming-batch-id": str(batch_id),
        }
        props = {f"streaming.{qid}.last-batch-id": str(batch_id)}
        if current_metadata_path(table_dir) is None:
            append(spark, table_dir, batch, extra_summary=markers,
                   extra_properties=props)
        else:
            merge_into(
                spark, table_dir, batch, on=on, extra_summary=markers,
                extra_properties=props,
            )

    return (
        stream_df.writeStream.foreachBatch(_commit)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
