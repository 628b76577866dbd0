"""Unit tests for snapshot-plane + schema-plane operators on the
hand-built fixtures: timeline formatting (C5), filters (F1/F8), schema
evolution (J2), partition-source join (J1), type display strings."""

from __future__ import annotations

from hielo_spark.metadata.fixtures import (
    synthetic_partition_specs,
    synthetic_schemas,
    synthetic_snapshots,
)
from hielo_spark.metadata.schemas import (
    display_type,
    evolution_changes,
    evolution_matrix,
    partition_source_join,
)
from hielo_spark.metadata.snapshots import SnapshotFilter, timeline


def test_timeline_formatting_c5(spark):
    rows = {
        r["snapshot_id"]: r.asDict()
        for r in timeline(synthetic_snapshots(spark)).filter("table_name = 'junk_t'").collect()
    }
    # null summary → records "0", size "N/A", op "unknown" (data.rs:156-184)
    assert rows[300]["records_added"] == "0"
    assert rows[300]["size_change"] == "N/A"
    assert rows[300]["operation"] == "unknown"
    # junk numerics pass through as display strings (no parsing in C5)
    assert rows[301]["records_added"] == "junk"
    # removed-files-size only (no added) → N/A
    assert rows[303]["size_change"] == "N/A"


def test_timeline_sorted_desc(spark):
    ids = [r["snapshot_id"] for r in timeline(synthetic_snapshots(spark)).filter("table_name = 'hot_t'").collect()]
    assert ids == sorted(ids, reverse=True)


def test_snapshot_filter_missing_values_pass(spark):
    # F1: rows with missing summary numerics pass range predicates
    flt = SnapshotFilter(min_added_files=1, max_added_files=1000)
    out = timeline(synthetic_snapshots(spark), flt).filter("table_name = 'junk_t'").collect()
    # 300 (null summary), 302-304 (no added-data-files) pass; 301 is junk →
    # try_cast null → passes too
    assert len(out) == 5
    assert flt.active_filter_count() == 1 and flt.is_filtered()
    assert SnapshotFilter().is_filtered() is False


def test_evolution_matrix_j2(spark):
    m = {
        r["field_id"]: r.asDict()
        for r in evolution_matrix(synthetic_schemas(spark), [0, 1, 2]).collect()
    }
    # field 2 (name): present s0, dropped s1, re-added s2
    assert m[2]["s0_type"] == "string" and m[2]["s1_type"] is None and m[2]["s2_type"] == "string"
    # field 3: type widened at s1
    assert m[3]["s0_type"] == "decimal(10, 2)" and m[3]["s1_type"] == "decimal(18, 4)"
    # field 4: added at s1, renamed at s2 — display name from first version
    assert m[4]["s0_type"] is None and m[4]["field_name"] == "ts"
    # field 1: required flip True→False at s1
    assert m[1]["s0_required"] is True and m[1]["s1_required"] is False


def test_evolution_changes_classification(spark):
    c = {
        (r["field_id"], r["schema_id"]): r["change"]
        for r in evolution_changes(synthetic_schemas(spark)).collect()
    }
    assert c[(1, 0)] == "added"
    assert c[(1, 1)] == "requirement_changed"
    assert c[(3, 1)] == "type_changed"
    assert c[(4, 2)] == "renamed"
    assert c[(6, 1)] == "unchanged"


def test_partition_source_join_j1(spark):
    out = partition_source_join(
        synthetic_partition_specs(spark),
        synthetic_schemas(spark).filter("schema_id = 2"),
    )
    rows = {r["field_id"]: r.asDict() for r in out.filter("table_name = 't'").collect()}
    # resolved source names from the current schema
    assert rows[1000]["source_field"] == "event_ts"  # source_id 4 → renamed field
    assert rows[1001]["source_field"] == "id"
    # dangling source_id 99 → fallback label (components.rs:1595-1597)
    assert rows[1003]["source_field"] == "Field 99"
    # spec evolution: field 1000 appears in both specs with different transforms
    transforms = {
        (r["spec_id"], r["field_id"]): r["transform"] for r in out.filter("table_name = 't'").collect()
    }
    assert transforms[(0, 1000)] == "day" and transforms[(1, 1000)] == "hour"


def test_display_type_strings():
    # reference display names (data.rs:66-85)
    assert display_type("bigint") == "long"
    assert display_type("decimal(10,2)") == "decimal(10, 2)"
    assert display_type("timestamp") == "timestamptz"
    assert display_type("timestamp_ntz") == "timestamp"
    assert display_type("array<string>") == "list"
    assert display_type("map<string,string>") == "map"
    assert display_type("struct<a:int>") == "struct"
