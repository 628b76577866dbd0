"""Partition statistics files (metadata/partition_stats.py — the
spec's "Partition Statistics" surface): per-partition aggregates
committed as one sorted parquet registered under metadata.json
``partition-statistics``, snapshot-bound expiry, and the skew report
they feed."""

from __future__ import annotations

import json
import os

import pytest

from hielo_spark.metadata import (
    commit as C,
)
from hielo_spark.metadata import (
    partition_skew_report,
    read_partition_statistics,
    write_partition_statistics,
)


def test_write_read_roundtrip_partitioned(spark, tmp_path):
    t = str(tmp_path / "t")
    C.append(spark, t, spark.createDataFrame(
        [(1, "us"), (2, "us"), (3, "eu")], ["id", "region"]),
        partition_by=["region"],
        snapshot_id=101, timestamp_ms=1700000000000)
    C.delete_where(spark, t, "id = 1",
                   snapshot_id=102, timestamp_ms=1700100000000)
    entry = write_partition_statistics(spark, t,
                                       timestamp_ms=1700200000000)
    assert entry["snapshot-id"] == 102
    assert os.path.exists(entry["statistics-path"])
    doc = json.load(open(C.current_metadata_path(t)))
    assert doc["partition-statistics"] == [entry]

    stats = {
        tuple(sorted((r.partition or {}).items())):
            (r.data_record_count, r.data_file_count,
             r.position_delete_record_count)
        for r in read_partition_statistics(spark, t).collect()
    }
    us_files = stats[(("region", "us"),)][1]
    assert stats[(("region", "us"),)] == (2, us_files, 0)
    assert stats[(("region", "eu"),)][0] == 1
    # delete files carry no partition metadata in this engine — their
    # counts aggregate under the EMPTY partition row (documented)
    assert stats[()][2] == 1
    # re-write for the same snapshot REPLACES the entry
    entry2 = write_partition_statistics(spark, t,
                                        timestamp_ms=1700300000000)
    doc = json.load(open(C.current_metadata_path(t)))
    assert doc["partition-statistics"] == [entry2]


def test_unpartitioned_single_row_and_missing_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(0, 7),
             snapshot_id=101, timestamp_ms=1700000000000)
    with pytest.raises(ValueError, match="no partition statistics"):
        read_partition_statistics(spark, t)
    write_partition_statistics(spark, t, timestamp_ms=1700100000000)
    rows = read_partition_statistics(spark, t).collect()
    assert len(rows) == 1
    assert rows[0].data_record_count == 7
    assert dict(rows[0].partition or {}) == {}


def test_expiry_drops_snapshot_bound_partition_stats(spark, tmp_path):
    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(0, 3),
             snapshot_id=101, timestamp_ms=1700000000000)
    e1 = write_partition_statistics(spark, t, timestamp_ms=1700000001000)
    C.append(spark, t, spark.range(3, 6),
             snapshot_id=102, timestamp_ms=1700100000000)
    e2 = write_partition_statistics(spark, t, timestamp_ms=1700100001000)
    C.expire_snapshots(t, older_than_ms=1700050000000, retain_last=1)
    doc = json.load(open(C.current_metadata_path(t)))
    assert [e["snapshot-id"] for e in doc["partition-statistics"]] == [102]
    assert not os.path.exists(e1["statistics-path"])
    assert os.path.exists(e2["statistics-path"])


def test_partition_skew_report(spark, tmp_path):
    t = str(tmp_path / "t")
    rows = (
        [(i, "hot") for i in range(900)]
        + [(i, f"p{i % 9}") for i in range(90)]
    )
    C.append(spark, t, spark.createDataFrame(rows, ["id", "part"]),
             partition_by=["part"],
             snapshot_id=101, timestamp_ms=1700000000000)
    write_partition_statistics(spark, t, timestamp_ms=1700000001000)
    hot = partition_skew_report(spark, t, hot_factor=4.0)
    assert len(hot) == 1
    assert hot[0]["partition"] == {"part": "hot"}
    assert hot[0]["data_record_count"] == 900
    assert "salt or split" in hot[0]["reason"]


def test_partition_statistics_surface(spark, tmp_path):
    from hielo_spark.sources import register

    register(spark)
    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(0, 5),
             snapshot_id=101, timestamp_ms=1700000000000)
    entry = write_partition_statistics(spark, t,
                                       timestamp_ms=1700000001000)
    rows = (spark.read.format("hielo_iceberg")
            .option("surface", "partition_statistics").load(t).collect())
    assert len(rows) == 1
    assert rows[0].snapshot_id == 101
    assert rows[0].statistics_path == entry["statistics-path"]
    assert rows[0].file_size_in_bytes == entry["file-size-in-bytes"]
