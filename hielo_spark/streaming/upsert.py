"""Idempotent keyed sink via foreachBatch — exactly-once *effect* on an
at-least-once stream.

File streams (and Kafka) redeliver on retry; a plain append sink then
duplicates rows. The standard fix when the table format has no MERGE
(plain parquet here; with Iceberg this whole module collapses to
``MERGE INTO`` inside the same foreachBatch) is an anti-join upsert:
each micro-batch drops keys already present in the sink, then appends
the remainder. Append-only writes never rewrite files being read, so
the read-own-sink anti-join is safe.

Scale: the anti-join's build side is the sink's key column only (pruned
scan); batches are bounded by the trigger, so per-batch work is
O(batch + sink keys). At very large sinks, partition the sink by a key
prefix so the anti-join prunes partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def upsert_to_parquet(stream_df: DataFrame, path: str, key_col: str, checkpoint: str):
    """Start a foreachBatch writer that appends only first-seen keys.
    Returns the StreamingQuery (caller awaits termination)."""
    spark = stream_df.sparkSession

    def _merge(batch: DataFrame, batch_id: int) -> None:
        fresh = batch.dropDuplicates([key_col])
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            existing_keys = spark.read.parquet(path).select(key_col)
            fresh = fresh.join(existing_keys, key_col, "left_anti")
        fresh.write.mode("append").parquet(path)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
