"""Table-metadata JSON → schemas_long parsing (v1/v2 layouts, nested
structs, decimal spacing) feeding the J2 evolution operators."""

from __future__ import annotations

import json

from hielo_spark.metadata.metadata_json import (
    parse_metadata_document,
    schemas_from_metadata_json,
)
from hielo_spark.metadata.schemas import evolution_matrix

V2_DOC = {
    "format-version": 2,
    "current-schema-id": 1,
    "schemas": [
        {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": True, "type": "long"},
                {"id": 2, "name": "price", "required": False, "type": "decimal(10,2)"},
                {
                    "id": 3,
                    "name": "addr",
                    "required": False,
                    "type": {
                        "type": "struct",
                        "fields": [
                            {"id": 4, "name": "street", "required": False, "type": "string", "doc": "street line"}
                        ],
                    },
                },
            ],
        },
        {
            "type": "struct",
            "schema-id": 1,
            "fields": [
                {"id": 1, "name": "id", "required": True, "type": "long"},
                {"id": 2, "name": "price", "required": True, "type": "decimal(18,4)"},
                {"id": 5, "name": "tags", "required": False, "type": {"type": "list", "element-id": 6, "element": "string", "element-required": False}},
            ],
        },
    ],
}

V1_DOC = {
    "format-version": 1,
    "schema": {
        "type": "struct",
        "fields": [{"id": 1, "name": "x", "required": True, "type": "int"}],
    },
}


def test_parse_v2_document():
    rows = list(parse_metadata_document("t", V2_DOC))
    by_key = {(r[1], r[2]): r for r in rows}
    assert by_key[(0, 2)][4] == "decimal(10, 2)"  # reference spacing
    assert by_key[(1, 2)][4] == "decimal(18, 4)"
    assert by_key[(0, 3)][4] == "struct"
    assert by_key[(0, 4)][7] == 3  # nested child carries parent_field_id
    assert by_key[(0, 4)][6] == "street line"  # doc preserved
    assert by_key[(1, 5)][4] == "list"
    assert (1, 4) not in by_key  # struct child dropped in v1→v2 evolution


def test_parse_v1_document():
    rows = list(parse_metadata_document("t", V1_DOC))
    assert rows == [("t", 0, 1, "x", "int", True, None, None)]


def test_distributed_parse_feeds_evolution(spark, tmp_path):
    p = tmp_path / "v2.metadata.json"
    p.write_text(json.dumps(V2_DOC))
    long_df = schemas_from_metadata_json(spark, [("t", str(p))])
    m = {r["field_id"]: r.asDict() for r in evolution_matrix(long_df, [0, 1]).collect()}
    assert m[2]["s0_type"] == "decimal(10, 2)" and m[2]["s1_type"] == "decimal(18, 4)"
    assert m[2]["s0_required"] is False and m[2]["s1_required"] is True
    assert m[5]["s0_type"] is None and m[5]["s1_type"] == "list"


def test_full_no_jar_metadata_plane(spark, tmp_path):
    """End-to-end on a real-shaped Iceberg warehouse dir, no runtime jar:
    metadata.json → snapshots frame → timeline/op-counts/latest, and the
    latest snapshot's manifest list (real Avro) → files frame → exact
    histogram."""
    import json

    from hielo_spark.metadata import snapshots as snap
    from hielo_spark.metadata.files import file_size_histogram
    from hielo_spark.metadata.manifests import files_from_manifest_list
    from hielo_spark.metadata.metadata_json import snapshots_from_metadata_json
    from tests.test_manifests import (
        MANIFEST_ENTRY,
        MANIFEST_LIST_V2,
        SNAP,
        _entry,
        _write_avro,
    )

    m1 = str(tmp_path / "m1.avro")
    MB = 1048576
    _write_avro(
        spark, m1, MANIFEST_ENTRY,
        [_entry(1, "s3://w/data/a.parquet", 3 * 1024 * MB, 1),
         _entry(1, "s3://w/data/b.parquet", 9 * 1024 * MB, 2)],
    )
    mlist = str(tmp_path / "snap-3.avro")
    _write_avro(
        spark, mlist, MANIFEST_LIST_V2,
        [{"manifest_path": m1, "manifest_length": SNAP, "partition_spec_id": 0,
          "added_snapshot_id": SNAP, "added_files_count": 2,
          "existing_files_count": 0, "deleted_files_count": 0}],
    )
    meta = {
        "format-version": 2,
        "table-uuid": "0000",
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1700000000000, "schema-id": 0,
             "manifest-list": "snap-1.avro",
             "summary": {"operation": "append", "added-data-files": "4",
                         "added-records": "100"}},
            {"snapshot-id": 2, "timestamp-ms": 1700086400000, "schema-id": 0,
             "manifest-list": "snap-2.avro",
             "summary": {"operation": "delete", "deleted-records": "7"}},
            {"snapshot-id": 3, "timestamp-ms": 1700172800000, "schema-id": 1,
             "manifest-list": mlist,
             "summary": {"operation": "rewrite-data-files", "added-data-files": "2"}},
            {"snapshot-id": 4, "timestamp-ms": 1700259200000, "schema-id": 1,
             "manifest-list": "snap-4.avro"},
        ],
    }
    mpath = str(tmp_path / "v2.metadata.json")
    with open(mpath, "w") as f:
        json.dump(meta, f)

    snaps = snapshots_from_metadata_json(spark, "real_t", mpath)
    assert snaps.count() == 4

    ops = {(r.operation): r.n for r in snap.operation_counts(snaps).collect()}
    assert ops == {"append": 1, "delete": 1, "rewrite-data-files": 1, "unknown": 1}

    latest = snap.latest_snapshot(snaps).collect()[0]
    assert latest.snapshot_id == 4 and latest.schema_id == 1

    tl = snap.timeline(snaps).collect()
    assert [r.snapshot_id for r in tl] == [4, 3, 2, 1]
    assert tl[1].operation == "rewrite-data-files"

    # the rewrite snapshot's manifest list → live files → exact histogram
    manifest_list_path = {r.snapshot_id: r.manifest_list for r in snaps.collect()}[3]
    files = files_from_manifest_list(spark, "real_t", manifest_list_path)
    hist = {r.bucket: r.n_files for r in file_size_histogram(files).collect()}
    assert hist == {"large(>512MB)": 2}


def test_history_and_refs_surfaces(spark, tmp_path):
    """t.history / t.refs shapes from our own commits: branch heads are
    refs but not current-ancestors until published; rollback flips
    ancestry."""
    import json

    from hielo_spark.metadata import commit as C
    from hielo_spark.metadata.metadata_json import (
        history_rows_from_doc,
        refs_rows_from_doc,
    )

    t = str(tmp_path / "wh" / "ns" / "t")
    C.append(spark, t, spark.createDataFrame([(1,)], ["id"]),
             snapshot_id=101, timestamp_ms=1700000000000)
    C.append(spark, t, spark.createDataFrame([(2,)], ["id"]),
             snapshot_id=102, timestamp_ms=1700100000000)
    C.append(spark, t, spark.createDataFrame([(3,)], ["id"]),
             snapshot_id=103, timestamp_ms=1700200000000, branch="audit")
    C.create_ref(t, "v1", 101, ref_type="tag")
    doc = json.load(open(C.current_metadata_path(t)))

    hist = history_rows_from_doc("t", doc)
    assert [(h[2], h[3], h[4]) for h in hist] == [
        (101, None, True),
        (102, 101, True),
        (103, 102, False),  # staged branch head: not a current ancestor
    ]
    assert refs_rows_from_doc("t", doc) == [
        ("t", "main", "branch", 102),
        ("t", "audit", "branch", 103),
        ("t", "v1", "tag", 101),
    ]

    # publish: the branch head becomes the current line
    C.fast_forward(t, "audit")
    doc = json.load(open(C.current_metadata_path(t)))
    assert [(h[2], h[4]) for h in history_rows_from_doc("t", doc)] == [
        (101, True), (102, True), (103, True)]
    assert refs_rows_from_doc("t", doc)[0] == ("t", "main", "branch", 103)

    # rollback: later snapshots drop off the current line
    C.rollback_to_snapshot(t, 101)
    doc = json.load(open(C.current_metadata_path(t)))
    assert [(h[2], h[4]) for h in history_rows_from_doc("t", doc)] == [
        (101, True), (102, False), (103, False)]
