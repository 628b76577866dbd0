"""S11/S12 SQL generation (pure logic; live execution needs the Iceberg
runtime jar, absent here)."""

from __future__ import annotations

import pytest

from hielo_spark.ops.maintenance import MaintenanceOp, time_travel_sql


def test_procedure_sql():
    op = MaintenanceOp("c", "ns.t")
    assert op.rewrite_data_files() == "CALL c.system.rewrite_data_files(table => 'ns.t', strategy => 'binpack')"
    assert (
        op.rewrite_data_files(target_file_size_bytes=512 * 1024 * 1024)
        == "CALL c.system.rewrite_data_files(table => 'ns.t', strategy => 'binpack', "
        "options => map('target-file-size-bytes', '536870912'))"
    )
    assert op.expire_snapshots("2025-01-01 00:00:00", retain_last=5) == (
        "CALL c.system.expire_snapshots(table => 'ns.t', older_than => '2025-01-01 00:00:00', retain_last => 5)"
    )
    assert op.rollback_to_snapshot(42) == "CALL c.system.rollback_to_snapshot(table => 'ns.t', snapshot_id => 42)"
    # onboarding procedures (r12; the no-jar add_files executable half
    # is metadata.commit.add_files, pinned in test_add_files.py)
    assert op.add_files("hive.db.src") == (
        "CALL c.system.add_files(table => 'ns.t', "
        "source_table => 'hive.db.src', check_duplicate_files => true)"
    )
    assert op.snapshot("hive.db.src") == (
        "CALL c.system.snapshot(table => 'ns.t', "
        "source_table => 'hive.db.src')"
    )
    assert op.migrate() == "CALL c.system.migrate(table => 'ns.t')"
    # quote escaping
    assert "''" in MaintenanceOp("c", "ns.o'brien").rewrite_manifests()


def test_time_travel_sql():
    assert time_travel_sql("c.ns.t", snapshot_id=7) == "SELECT * FROM c.ns.t VERSION AS OF 7"
    assert time_travel_sql("c.ns.t", timestamp="2025-06-01 00:00:00") == (
        "SELECT * FROM c.ns.t TIMESTAMP AS OF '2025-06-01 00:00:00'"
    )
    with pytest.raises(ValueError):
        time_travel_sql("t")
    with pytest.raises(ValueError):
        time_travel_sql("t", snapshot_id=1, timestamp="x")


@pytest.mark.slow
def test_rewrite_position_deletes_compacts_exactly(spark, tmp_path):
    """r7: position-delete compaction — accumulated per-commit delete
    files merge into one hash-partitioned set, never-applied and
    dead-target rows drop, and sequence-scoped MOR reads are
    bit-identical on both planes before/after."""
    from hielo_spark.metadata import commit as C
    from hielo_spark.metadata import rewrite_position_deletes
    from hielo_spark.metadata.manifests import read_data_at_snapshot

    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(0, 100).selectExpr("id AS k").coalesce(1),
             snapshot_id=101, timestamp_ms=1700000000000)
    C.delete_where(spark, t, "k < 5",
                   snapshot_id=102, timestamp_ms=1700100000000)
    C.append(spark, t,
             spark.range(1000, 1100).selectExpr("id AS k").coalesce(1),
             snapshot_id=103, timestamp_ms=1700200000000)
    C.delete_where(spark, t, "k >= 1095",
                   snapshot_id=104, timestamp_ms=1700300000000)
    # duplicate delete of already-deleted rows (overlapping positions)
    C.delete_where(spark, t, "k >= 1090",
                   snapshot_id=105, timestamp_ms=1700400000000)

    before = read_data_at_snapshot(spark, C.current_metadata_path(t))
    want = {r.k for r in before.collect()}
    assert want == (set(range(5, 100)) | set(range(1000, 1090)))

    def n_pos_files(mpath):
        import json as _json

        from hielo_spark.metadata.avro_py import read_avro_file
        from hielo_spark.metadata.manifests import decode_manifest

        doc = _json.load(open(mpath))
        snap = next(s for s in doc["snapshots"]
                    if s["snapshot-id"] == doc["current-snapshot-id"])
        n = 0
        _, _, mrows = read_avro_file(
            snap["manifest-list"].removeprefix("file:"))
        for m in mrows:
            for e in decode_manifest(m["manifest_path"]):
                if e[0] != 2 and e[6] == 1:
                    n += 1
        return n

    assert n_pos_files(C.current_metadata_path(t)) >= 3
    snap = rewrite_position_deletes(spark, t, snapshot_id=106,
                                    timestamp_ms=1700500000000)
    assert snap is not None
    assert snap["summary"]["operation"] == "replace"
    # compacted: fewer files, duplicates collapsed
    m2 = C.current_metadata_path(t)
    assert n_pos_files(m2) < 3
    after = read_data_at_snapshot(spark, m2)
    assert {r.k for r in after.collect()} == want

    from hielo_spark.sources import register

    register(spark)
    ds = spark.read.format("hielo_iceberg").load(t)
    assert {r.k for r in ds.collect()} == want

    # time travel to the pre-rewrite snapshot still exact
    old = read_data_at_snapshot(spark, m2, snapshot_id=104)
    assert {r.k for r in old.collect()} == (
        set(range(5, 100)) | set(range(1000, 1095)))

    # a post-rewrite append stays undeleted (seq scoping intact: the
    # rewritten deletes are at a LOWER seq than the new file)
    C.append(spark, t, spark.createDataFrame([(3,)], "k long"),
             snapshot_id=107, timestamp_ms=1700600000000)
    latest = read_data_at_snapshot(spark, C.current_metadata_path(t))
    assert {r.k for r in latest.collect()} == want | {3}


def test_rewrite_position_deletes_noop_cases(spark, tmp_path):
    from hielo_spark.metadata import commit as C
    from hielo_spark.metadata import rewrite_position_deletes

    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(0, 10).selectExpr("id AS k"),
             snapshot_id=101, timestamp_ms=1700000000000)
    assert rewrite_position_deletes(spark, t) is None  # no deletes
    C.delete_where(spark, t, "k = 1",
                   snapshot_id=102, timestamp_ms=1700100000000)
    assert rewrite_position_deletes(spark, t) is None  # single file


def test_rewrite_position_deletes_drops_dead_targets(spark, tmp_path):
    """Deletes whose target data file was replaced by compaction are
    dead weight — the rewrite drops them entirely."""
    from hielo_spark.metadata import commit as C
    from hielo_spark.metadata import rewrite_position_deletes
    from hielo_spark.metadata.manifests import read_data_at_snapshot

    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(0, 50).selectExpr("id AS k").coalesce(1),
             snapshot_id=101, timestamp_ms=1700000000000)
    C.delete_where(spark, t, "k < 5",
                   snapshot_id=102, timestamp_ms=1700100000000)
    C.delete_where(spark, t, "k >= 45",
                   snapshot_id=103, timestamp_ms=1700200000000)
    # compaction REPLACE bakes the deletes in and drops delete manifests
    C.rewrite_data_files(spark, t, snapshot_id=104,
                         timestamp_ms=1700300000000)
    # no pos-delete files remain → no-op
    assert rewrite_position_deletes(spark, t) is None
    df = read_data_at_snapshot(spark, C.current_metadata_path(t))
    assert df.count() == 40
