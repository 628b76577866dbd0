"""Iceberg partition statistics files (spec "Partition Statistics").

The spec registers per-snapshot partition-level aggregates in the
table metadata's ``partition-statistics`` list — ``{snapshot-id,
statistics-path, file-size-in-bytes}`` — pointing at ONE sorted
parquet file of per-partition rows (data/delete record+file counts and
bytes). Engines use it to answer partition-level questions (SHOW
PARTITIONS, skew inspection, planning heuristics) without walking
manifests.

Deviation, documented: the spec's ``partition`` field is a struct of
the unified partition tuple keyed by field id; our parquet files carry
no Iceberg field ids anywhere (name-mapping engine), so the partition
rides as the same stringified ``map<string,string>`` the rest of this
engine uses for partition values (``t.partitions``, manifest pvals).

Second deviation: our row-level delete writers don't stamp partition
values on delete files (they can span partitions), so delete
record/file counts without partition metadata aggregate under the
EMPTY partition row rather than their data partitions — per-partition
delete attribution would require joining deletes to data files, which
is scan work, not metadata work.

Scale: the aggregate is one distributed groupBy over the files frame
(rows = live files, output rows = live partitions); only the final
single-file write is serial — the format REQUIRES one sorted file, and
its row count is the partition count, planning-plane size.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import time
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession


def write_partition_statistics(
    spark: SparkSession,
    table_dir: str,
    timestamp_ms: int | None = None,
) -> dict:
    """Compute the CURRENT snapshot's partition statistics and register
    the file under metadata.json ``partition-statistics`` (replacing a
    prior entry for the same snapshot). Returns the registered entry.
    Unpartitioned tables aggregate to a single empty-partition row."""
    from pyspark.sql import functions as F

    from .commit import _commit_doc, _load_doc, current_metadata_path
    from .manifests import files_from_manifest_list

    doc, prev_version = _load_doc(table_dir)
    snap_id = doc.get("current-snapshot-id")
    if snap_id is None:
        raise ValueError(
            "cannot write partition statistics: table has no snapshot"
        )
    snap = next(
        s for s in doc.get("snapshots", []) if s["snapshot-id"] == snap_id
    )
    timestamp_ms = (
        timestamp_ms if timestamp_ms is not None
        else int(time.time() * 1000)
    )
    files = files_from_manifest_list(
        spark, os.path.basename(table_dir),
        snap["manifest-list"].removeprefix("file:"), content=None,
    )
    agg = (
        files.withColumn(
            "partition",
            F.coalesce(
                "partition_values",
                F.create_map().cast("map<string,string>"),
            ),
        )
        .groupBy("partition")
        .agg(
            F.sum(F.when(F.col("content") == 0, F.col("record_count"))
                  .otherwise(0)).alias("data_record_count"),
            F.sum(F.when(F.col("content") == 0, 1).otherwise(0))
            .cast("int").alias("data_file_count"),
            F.sum(F.when(F.col("content") == 0,
                         F.col("file_size_in_bytes")).otherwise(0))
            .alias("total_data_file_size_in_bytes"),
            F.sum(F.when(F.col("content") == 1, F.col("record_count"))
                  .otherwise(0)).alias("position_delete_record_count"),
            F.sum(F.when(F.col("content") == 1, 1).otherwise(0))
            .cast("int").alias("position_delete_file_count"),
            F.sum(F.when(F.col("content") == 2, F.col("record_count"))
                  .otherwise(0)).alias("equality_delete_record_count"),
            F.sum(F.when(F.col("content") == 2, 1).otherwise(0))
            .cast("int").alias("equality_delete_file_count"),
            F.max("sequence_number").alias("last_updated_sequence_number"),
        )
        .withColumn("spec_id", F.lit(int(doc.get("default-spec-id", 0))))
        .withColumn("last_updated_at", F.lit(int(timestamp_ms)))
    )
    # the spec mandates ONE file, sorted by partition — the aggregate
    # above is distributed; only this final write is serial, and its
    # row count is the live-partition count
    tmp = os.path.join(
        table_dir, "metadata", f"_pstats-tmp-{_uuid.uuid4().hex[:8]}"
    )
    (
        agg.orderBy(F.map_entries("partition").cast("string"))
        .coalesce(1)
        .write.parquet(tmp)
    )
    part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    path = os.path.join(
        table_dir, "metadata",
        f"partition-stats-{snap_id}-{_uuid.uuid4().hex[:8]}.parquet",
    )
    shutil.move(part, path)
    shutil.rmtree(tmp, ignore_errors=True)

    entry = {
        "snapshot-id": int(snap_id),
        "statistics-path": path,
        "file-size-in-bytes": os.path.getsize(path),
    }
    # re-load for the commit (the aggregate ran a Spark job; another
    # writer may have advanced the version — last-writer-wins on the
    # stats entry is Iceberg's own behavior for stats commits)
    doc, prev_version = _load_doc(table_dir)
    doc = dict(doc)
    prior = [
        e for e in doc.get("partition-statistics", [])
        if e.get("snapshot-id") != int(snap_id)
    ]
    doc["partition-statistics"] = prior + [entry]
    doc["last-updated-ms"] = timestamp_ms
    _commit_doc(table_dir, doc, prev_version)
    assert current_metadata_path(table_dir) is not None
    return entry


def read_partition_statistics(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """The registered partition-statistics frame for ``snapshot_id``
    (default: the current snapshot). Raises with guidance when none is
    registered — statistics are explicit commits, never recomputed
    silently on read."""
    from .commit import _load_doc

    doc = _load_doc(table_dir)[0]
    sid = (
        int(snapshot_id) if snapshot_id is not None
        else doc.get("current-snapshot-id")
    )
    entry = next(
        (
            e for e in doc.get("partition-statistics", [])
            if e.get("snapshot-id") == sid
        ),
        None,
    )
    if entry is None:
        raise ValueError(
            f"no partition statistics registered for snapshot {sid} "
            "(run write_partition_statistics)"
        )
    return spark.read.parquet(entry["statistics-path"])


def partition_skew_report(
    spark: SparkSession,
    table_dir: str,
    hot_factor: float = 4.0,
) -> list[dict]:
    """Planning advice from the partition-statistics plane: partitions
    whose live data_record_count exceeds ``hot_factor`` × the median —
    the hot-partition shape where a partition-aligned job stalls on a
    few tasks and the caller should salt, split, or sort-compact those
    partitions. One percentile + one filtered collect of only the hot
    rows (bounded by how many partitions are actually hot)."""
    from pyspark.sql import functions as F

    stats = read_partition_statistics(spark, table_dir)
    med = stats.agg(
        F.percentile_approx("data_record_count", 0.5).alias("m")
    ).collect()[0].m
    if not med:
        return []
    hot = (
        stats.filter(F.col("data_record_count") > float(hot_factor) * med)
        .select("partition", "data_record_count")
        .collect()
    )
    return [
        {
            "partition": dict(r.partition or {}),
            "data_record_count": int(r.data_record_count),
            "median_record_count": int(med),
            "reason": (
                f"{int(r.data_record_count)} rows > {hot_factor}x "
                f"median {int(med)} — salt or split this partition"
            ),
        }
        for r in hot
    ]
