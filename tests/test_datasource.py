"""hielo_iceberg Python DataSource (sources/iceberg_source.py): batch
reads with time travel + MOR deletes + manifest-bounds file pruning, the
append streaming source, and the pure-Python Avro reader underneath it
(metadata/avro_py.py) cross-checked against the JVM read plane."""

from __future__ import annotations

import json

import pytest

from hielo_spark.metadata import commit as C


@pytest.fixture()
def registered(spark):
    from hielo_spark.sources import register

    register(spark)
    return spark


@pytest.fixture()
def mor_table(spark, tmp_path):
    """append → equality delete → re-insert: the sequence-scoping case."""
    t = str(tmp_path / "t")
    C.append(spark, t, spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]),
        snapshot_id=101, timestamp_ms=1700000000000)
    C.delete_equality(spark, t, spark.createDataFrame([(2,)], ["id"]),
                      snapshot_id=102, timestamp_ms=1700100000000)
    C.append(spark, t, spark.createDataFrame([(2, "b2")], ["id", "v"]),
             snapshot_id=103, timestamp_ms=1700200000000)
    return t


def test_avro_py_matches_jvm_reader(spark, mor_table):
    """The pure-Python Avro decoder returns the same manifest-list rows
    as the JVM-backed read plane."""
    from hielo_spark.metadata.avro_py import read_avro_file
    from hielo_spark.metadata.manifests import read_manifest_list

    doc = json.load(open(C.current_metadata_path(mor_table)))
    snap = next(s for s in doc["snapshots"]
                if s["snapshot-id"] == doc["current-snapshot-id"])
    mlist = snap["manifest-list"].removeprefix("file:")
    _, meta, rows = read_avro_file(mlist)
    jvm_rows = read_manifest_list(spark, mlist).collect()
    assert len(rows) == len(jvm_rows)
    got = {(r["manifest_path"], r["content"], r["sequence_number"])
           for r in rows}
    want = {(r.manifest_path, r.content or 0, r.sequence_number)
            for r in jvm_rows}
    assert got == want
    assert meta["format-version"] == b"2"


def test_batch_read_current_and_time_travel(registered, mor_table):
    spark = registered
    df = spark.read.format("hielo_iceberg").load(mor_table)
    assert sorted((r.id, r.v) for r in df.collect()) == [
        (1, "a"), (2, "b2"), (3, "c")]  # re-insert survives its own delete
    old = (spark.read.format("hielo_iceberg")
           .option("snapshot-id", "101").load(mor_table))
    assert sorted((r.id, r.v) for r in old.collect()) == [
        (1, "a"), (2, "b"), (3, "c")]
    asof = (spark.read.format("hielo_iceberg")
            .option("as-of-ms", "1700150000000").load(mor_table))
    assert sorted((r.id, r.v) for r in asof.collect()) == [(1, "a"), (3, "c")]


def test_batch_read_matches_jvm_plane(registered, mor_table):
    from hielo_spark.metadata.manifests import read_data_at_snapshot

    spark = registered
    via_source = sorted(
        (r.id, r.v)
        for r in spark.read.format("hielo_iceberg").load(mor_table).collect()
    )
    via_jvm = sorted(
        (r.id, r.v)
        for r in read_data_at_snapshot(
            spark, C.current_metadata_path(mor_table)
        ).collect()
    )
    assert via_source == via_jvm


def test_partitioned_read_reattaches_values(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    C.append(spark, t, spark.createDataFrame(
        [(1, "us", "a"), (2, "eu", "b"), (3, "us", "c")],
        ["id", "region", "v"]),
        partition_by=["region"], snapshot_id=101, timestamp_ms=1700000000000)
    df = spark.read.format("hielo_iceberg").load(t)
    assert sorted((r.id, r.region) for r in df.collect()) == [
        (1, "us"), (2, "eu"), (3, "us")]
    assert sorted(r.id for r in df.filter("region = 'eu'").collect()) == [2]


def test_pushed_filters_prune_files(registered, tmp_path):
    """Disjoint-range appends → a >= filter must drop whole files from
    the plan via manifest bounds."""
    from pyspark.sql.datasource import GreaterThanOrEqual

    from hielo_spark.sources.iceberg_source import HieloIcebergReader

    spark = registered
    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(0, 10).coalesce(1),
             snapshot_id=101, timestamp_ms=1700000000000)
    C.append(spark, t, spark.range(100, 110).coalesce(1),
             snapshot_id=102, timestamp_ms=1700100000000)
    cols = [("id", "bigint")]
    r_all = HieloIcebergReader(t, {}, cols)
    r_flt = HieloIcebergReader(t, {}, cols)
    list(r_flt.pushFilters([GreaterThanOrEqual(("id",), 100)]))
    assert len(r_all.partitions()) == 2
    assert len(r_flt.partitions()) == 1
    # and the full query still returns exactly the filtered rows
    df = spark.read.format("hielo_iceberg").load(t).filter("id >= 100")
    assert df.count() == 10


def test_streaming_source_appends(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    C.append(spark, t, spark.createDataFrame([(1, "a")], ["id", "v"]),
             snapshot_id=101, timestamp_ms=1700000000000)

    def drain():
        q = (
            spark.readStream.format("hielo_iceberg")
            .option("initial-snapshot", "earliest").load(t)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    assert sorted((r.id, r.v) for r in spark.read.parquet(out).collect()) == [
        (1, "a")]
    C.append(spark, t, spark.createDataFrame([(2, "b")], ["id", "v"]),
             snapshot_id=102, timestamp_ms=1700100000000)
    C.append(spark, t, spark.createDataFrame([(3, "c")], ["id", "v"]),
             snapshot_id=103, timestamp_ms=1700200000000)
    drain()
    # exactly the two new snapshots' rows arrive — no replays, no gaps
    assert sorted((r.id, r.v) for r in spark.read.parquet(out).collect()) == [
        (1, "a"), (2, "b"), (3, "c")]
