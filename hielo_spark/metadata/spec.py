"""Apache Iceberg v2 format inventories, embedded from the PUBLISHED
spec (https://iceberg.apache.org/spec/ — public document; the reference
trusts the `iceberg` crate for this, Cargo.toml:18-20, while we write
the format ourselves, so these tables are the ground truth our writer
is pinned against, the same way metadata/transforms.py pins the spec's
four published murmur3 bucket vectors).

Three kinds of artifact are inventoried:

* **manifest list** (`manifest_file` Avro record, spec "Manifest Lists"
  table): one row per manifest of a snapshot;
* **manifest** (`manifest_entry` Avro record wrapping `data_file` r2,
  spec "Manifests" table): one row per data/delete file;
* **table metadata** (JSON document, spec "Table Metadata" fields
  table) plus the snapshot object and its summary.

Each entry is ``(field_id, name, type, required_in_v2)``. Field ids are
the spec's permanently-assigned ids — they are written as the
``field-id`` attribute on Avro schema fields, which is how Iceberg's
own readers match columns independent of names (Appendix A: "Iceberg
writes the field ids as the `field-id` property of the Avro field
schema"). Types use the spec's names.

`avro_field_ids(schema_json)` extracts the attribute back out of a
written file's schema so tests can assert round-trip conformance.
"""

from __future__ import annotations

import json

# spec "Manifest Lists": v2 manifest_file fields. Naming note from the
# spec: the count fields were `added_data_files_count` etc. in v1
# (read-side aliases in manifests.py handle both).
MANIFEST_LIST_FIELDS = [
    (500, "manifest_path", "string", True),
    (501, "manifest_length", "long", True),
    (502, "partition_spec_id", "int", True),
    (517, "content", "int", True),
    (515, "sequence_number", "long", True),
    (516, "min_sequence_number", "long", True),
    (503, "added_snapshot_id", "long", True),
    (504, "added_files_count", "int", True),
    (505, "existing_files_count", "int", True),
    (506, "deleted_files_count", "int", True),
    (512, "added_rows_count", "long", True),
    (513, "existing_rows_count", "long", True),
    (514, "deleted_rows_count", "long", True),
    (507, "partitions", "list<508: field_summary>", False),
    (519, "key_metadata", "binary", False),
]

# spec "Manifests": manifest_entry wrapper fields (v2)
MANIFEST_ENTRY_FIELDS = [
    (0, "status", "int", True),
    (1, "snapshot_id", "long", False),   # inherited when null
    (3, "sequence_number", "long", False),  # inherited when null (ADDED)
    (4, "file_sequence_number", "long", False),
    (2, "data_file", "record", True),
]

# spec "Manifests": data_file struct fields (v2). The `partition` field
# is a record named r102 whose fields mirror the partition spec, each
# carrying its partition field id (1000+) as `field-id`.
DATA_FILE_FIELDS = [
    (134, "content", "int", True),
    (100, "file_path", "string", True),
    (101, "file_format", "string", True),
    (102, "partition", "record:r102", True),
    (103, "record_count", "long", True),
    (104, "file_size_in_bytes", "long", True),
    (108, "column_sizes", "map<117:int,118:long>", False),
    (109, "value_counts", "map<119:int,120:long>", False),
    (110, "null_value_counts", "map<121:int,122:long>", False),
    (137, "nan_value_counts", "map<138:int,139:long>", False),
    (125, "lower_bounds", "map<126:int,127:binary>", False),
    (128, "upper_bounds", "map<129:int,130:binary>", False),
    (131, "key_metadata", "binary", False),
    (132, "split_offsets", "list<133: long>", False),
    (135, "equality_ids", "list<136: int>", False),
    (140, "sort_order_id", "int", False),
]

# spec "Table Metadata": fields REQUIRED in a v2 metadata.json
TABLE_METADATA_REQUIRED_V2 = [
    "format-version",
    "table-uuid",
    "location",
    "last-sequence-number",
    "last-updated-ms",
    "last-column-id",
    "schemas",
    "current-schema-id",
    "partition-specs",
    "default-spec-id",
    "last-partition-id",
    "sort-orders",
    "default-sort-order-id",
]

# spec "Snapshots": required snapshot-object fields (v2)
SNAPSHOT_REQUIRED_V2 = [
    "snapshot-id",
    "sequence-number",
    "timestamp-ms",
    "manifest-list",
    "summary",
]

# spec "Snapshots" summary: `operation` is required and one of these
SUMMARY_OPERATIONS = {"append", "replace", "overwrite", "delete"}

# spec "Snapshots" summary: the optional metric keys (other keys are
# allowed; ours must not COLLIDE with these while meaning something else)
SUMMARY_METRIC_KEYS = {
    "added-data-files", "deleted-data-files", "total-data-files",
    "added-delete-files", "added-position-delete-files",
    "added-equality-delete-files", "removed-delete-files",
    "total-delete-files", "added-records", "deleted-records",
    "total-records", "added-files-size", "removed-files-size",
    "total-files-size", "added-position-deletes",
    "removed-position-deletes", "total-position-deletes",
    "added-equality-deletes", "removed-equality-deletes",
    "total-equality-deletes",
}

# Summary keys the REFERENCE's health suite reads that are NOT spec
# names (hielo data.rs:98-108 parses `total-size`; the spec calls the
# same number `total-files-size`). Our commits emit BOTH; conformance
# checks treat these as documented reference-parity extensions.
REFERENCE_PARITY_SUMMARY_KEYS = {"total-size"}

# Avro file-header metadata keys the spec requires on each artifact
# (spec "Manifests" / "Manifest Lists": "The schema of a manifest file
# is a struct ... with the following metadata")
MANIFEST_HEADER_KEYS_V2 = [
    "schema", "partition-spec", "partition-spec-id", "format-version",
    "content",
]
MANIFEST_LIST_HEADER_KEYS_V2 = [
    "snapshot-id", "sequence-number", "format-version",
]


def avro_field_ids(schema_json: str | dict) -> dict[str, int]:
    """``{field_name: field-id}`` for every field in an Avro record
    schema JSON that carries the spec's ``field-id`` attribute
    (top level only; recurse manually for nested records)."""
    doc = (
        json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    )
    out: dict[str, int] = {}
    for f in doc.get("fields", []):
        if "field-id" in f:
            out[f["name"]] = int(f["field-id"])
    return out


def nested_record(schema_json: str | dict, field_name: str) -> dict | None:
    """The record schema of ``field_name`` inside an Avro record schema
    (unwrapping a ["null", X] union if present)."""
    doc = (
        json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    )
    for f in doc.get("fields", []):
        if f["name"] != field_name:
            continue
        t = f["type"]
        if isinstance(t, list):  # union
            t = next(x for x in t if x != "null")
        return t if isinstance(t, dict) else None
    return None
