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
