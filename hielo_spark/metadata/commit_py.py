"""Pure-Python append COMMIT (no JVM) — the metadata half of
``commit.append`` recomposed for processes that cannot reach a
SparkSession: the Python DataSource writer's ``commit()`` runs in a
plain worker, receives the parquet files its executors wrote, and must
still produce a real snapshot (manifest Avro → manifest list →
metadata.json version bump with the Hadoop-catalog rename guard).

Artifacts are IDENTICAL to the JVM path's: same Avro schemas
(``commit.MANIFEST_ENTRY_SCHEMA_V2`` / ``MANIFEST_LIST_SCHEMA_V2``,
spec field-ids + r102 + Appendix D binary bounds), same header
metadata, same metadata.json fields (snapshot-log, sort-orders,
last-column-id, running totals) — written through
``metadata/avro_py.write_avro_file`` instead of the JVM library, and
pinned equal by tests (the JVM read plane reads these commits back
bit-for-bit).

Scope: appends/overwrites under the table's recorded default spec —
unpartitioned, or identity-partitioned with the WRITER tasks splitting
rows per partition and attaching per-file ``partition_values`` (hive
semantics: values live in the manifest r102 record + engine-extension
maps, not the files). Non-identity transforms on this surface raise
loudly (the JVM plane handles them). Concurrency: the same ``os.link``
optimistic rename in ``commit._commit_doc``.
"""

from __future__ import annotations

import os
import time
import uuid as _uuid

from . import commit as C
from .avro_py import read_avro_file, write_avro_file


def _carry_forward_rows_py(
    mdir: str, doc: dict, base_id: int | None = None
) -> list[dict]:
    """Pure-python twin of commit._carry_forward_rows: the base
    snapshot's manifest-list rows re-emitted as existing. ``base_id``
    defaults to the current snapshot; branch commits pass the branch
    head instead."""
    snaps = doc.get("snapshots", [])
    if base_id is None:
        base_id = doc.get("current-snapshot-id")
    cur = next(
        (s for s in snaps if s.get("snapshot-id") == base_id),
        None,
    )
    if cur is None:
        return []
    mlist = cur["manifest-list"].removeprefix("file:")
    if not os.path.isabs(mlist):
        mlist = os.path.join(mdir, mlist)
    _, _, rows = read_avro_file(mlist)
    out = []
    for m in rows:
        # a manifest whose only content was status=2 tombstones lives
        # exactly one snapshot (spec: deleted entries belong to the
        # snapshot that deleted them) — same drop rule as the JVM twin;
        # dynamic overwrites make fully-tombstoned manifests reachable
        # on this plane too
        if (
            (m.get("added_files_count") or 0)
            + (m.get("existing_files_count") or 0) == 0
            and (m.get("deleted_files_count") or 0) > 0
        ):
            continue
        out.append(
            {
                "manifest_path": m["manifest_path"],
                "manifest_length": m["manifest_length"],
                "partition_spec_id": m.get("partition_spec_id") or 0,
                "content": m.get("content") or 0,
                "sequence_number": m.get("sequence_number") or 0,
                "min_sequence_number": m.get("min_sequence_number") or 0,
                "added_snapshot_id": m.get("added_snapshot_id") or 0,
                "added_files_count": 0,
                "existing_files_count": (m.get("added_files_count") or 0)
                + (m.get("existing_files_count") or 0),
                "deleted_files_count": 0,
                "added_rows_count": 0,
                "existing_rows_count": (m.get("added_rows_count") or 0)
                + (m.get("existing_rows_count") or 0),
                "deleted_rows_count": 0,
            }
        )
    return out


def append_files(
    table_dir: str,
    files: list[dict],
    dtypes: dict[str, str],
    snapshot_id: int | None = None,
    timestamp_ms: int | None = None,
    extra_summary: dict[str, str] | None = None,
    extra_properties: dict[str, str] | None = None,
    mode: str = "append",
    branch: str | None = None,
) -> dict:
    """Commit already-written parquet ``files`` as one snapshot.

    Each file dict: ``{path, record_count, file_size_in_bytes,
    lower_bounds, upper_bounds, null_counts}`` with bounds/counts as the
    stringified engine-extension maps (``bounds_types`` = ``dtypes``
    restricted to bounded columns). Returns the snapshot dict.

    ``mode="overwrite"`` composes a REPLACE-style snapshot: no manifest
    carry-forward (the new files ARE the table), summary operation
    ``overwrite`` with reset running totals — Iceberg's truncate-and-
    write. ``mode="dynamic-overwrite"`` is dynamic PARTITION overwrite:
    prior manifests carry forward with live entries of exactly the
    incoming files' partition tuples tombstoned (copy-on-write, the
    same helper the JVM-plane overwrite_partitions uses); on an
    unpartitioned table it dooms every live data file (full overwrite,
    but time-travel-preserving tombstones rather than a bare replace).
    ``branch`` stages the commit on that branch ref instead of
    moving ``current-snapshot-id`` (the write half of write-audit-
    publish; publish with ``commit.fast_forward``); readers see the
    staged rows only via ``ref=branch`` / ``option("branch", ...)``."""
    if mode not in ("append", "overwrite", "dynamic-overwrite"):
        raise ValueError(f"unsupported commit mode {mode!r}")
    doc, prev_version = C._load_doc(table_dir)
    base_id = doc.get("current-snapshot-id")
    if branch is not None:
        ref = doc.get("refs", {}).get(branch)
        if ref is not None:
            if ref.get("type") != "branch":
                raise ValueError(f"ref {branch!r} is a tag, not a branch")
            base_id = int(ref["snapshot-id"])
    seq = int(doc.get("last-sequence-number", 0)) + 1
    snapshot_id = (
        snapshot_id if snapshot_id is not None
        else C._default_snapshot_id(doc, seq)
    )
    timestamp_ms = (
        timestamp_ms if timestamp_ms is not None else int(time.time() * 1000)
    )
    mdir = os.path.join(table_dir, "metadata")
    os.makedirs(mdir, exist_ok=True)
    C._record_table_shape(doc, dtypes, [])
    # partitioned tables: the writer tasks must have split their rows by
    # the spec's identity fields and attached per-file partition_values
    # (hive semantics — the values live in the manifest, not the file).
    # A partitioned spec with files missing those values would attribute
    # spec fields to entries that carry none — refuse loudly rather than
    # record inconsistent metadata.
    spec_id = int(doc.get("default-spec-id", 0))
    default_spec = next(
        (
            s for s in doc.get("partition-specs", [])
            if s.get("spec-id") == spec_id
        ),
        None,
    )
    partitioned = bool(default_spec and default_spec.get("fields"))
    if partitioned and any(f.get("partition_values") is None for f in files):
        raise ValueError(
            f"table {table_dir!r} has a partitioned default spec but the "
            "write produced files without partition values — the writer "
            "must split rows by the spec's identity fields"
        )
    ptypes = None
    if partitioned:
        ptypes = {}
        for f in files:
            ptypes.update(f.get("partition_types") or {})
    pfields = C._partition_avro_fields(doc, ptypes, spec_id)
    entry_schema = (
        C.manifest_entry_schema(pfields)
        if partitioned
        else C.MANIFEST_ENTRY_SCHEMA_V2
    )
    name2id = C._name2id(doc)
    btypes = {
        c: t for c, t in dtypes.items()
        if any(c in (f.get("lower_bounds") or {}) for f in files)
    } or None

    # v3 row lineage: the DataSource write plane assigns ids exactly
    # like the JVM-plane append (field 142 per file, contiguous from
    # the next-row-id watermark; the snapshot/doc advance below)
    fv = int(doc.get("format-version", 2))
    first_row_id_of: dict[str, int | None] = {f["path"]: None for f in files}
    if fv >= 3:
        rid = int(doc.get("next-row-id", 0))
        for f in files:
            first_row_id_of[f["path"]] = rid
            rid += int(f["record_count"])

    manifest_path = os.path.join(
        mdir, f"manifest-{seq:05d}-{_uuid.uuid4().hex[:8]}.avro"
    )
    write_avro_file(
        manifest_path,
        entry_schema,
        [
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "data_file": {
                    "content": 0,
                    "file_path": f["path"],
                    "file_format": "PARQUET",
                    "first_row_id": first_row_id_of[f["path"]],
                    "partition": C._typed_partition(
                        f.get("partition_values"), pfields
                    ) if partitioned else {},
                    "record_count": int(f["record_count"]),
                    "file_size_in_bytes": int(f["file_size_in_bytes"]),
                    **C._spec_stats(
                        name2id, btypes, f.get("lower_bounds"),
                        f.get("upper_bounds"), f.get("null_counts"),
                        int(f["record_count"]),
                    ),
                    **(
                        {
                            "partition_values": f.get("partition_values"),
                            "partition_types": f.get("partition_types"),
                        }
                        if partitioned else {}
                    ),
                    "lower_bounds_str": f.get("lower_bounds"),
                    "upper_bounds_str": f.get("upper_bounds"),
                    "bounds_types": btypes,
                    "null_counts": f.get("null_counts"),
                },
            }
            for f in files
        ],
        meta=C._manifest_header_meta(doc, spec_id, "data"),
    )

    added_records = sum(int(f["record_count"]) for f in files)
    added_bytes = sum(int(f["file_size_in_bytes"]) for f in files)
    overwrite = mode == "overwrite"
    dynamic = mode == "dynamic-overwrite"
    prior_rows = (
        [] if overwrite else _carry_forward_rows_py(mdir, doc, base_id)
    )
    dropped_files = dropped_rows = dropped_bytes = 0
    if dynamic:
        pfield_names = [
            fld.get("name") for fld in (default_spec or {}).get("fields", [])
        ]
        incoming: set[tuple] = set()
        for f in files:
            pv = f.get("partition_values")
            if pv:
                incoming.add(tuple(str(pv.get(n)) for n in pfield_names))
        prior_rows, dropped_files, dropped_rows, dropped_bytes = (
            C._tombstone_partitions_in_rows(
                prior_rows, incoming, pfield_names, mdir, seq,
                snapshot_id, fv, current_spec_id=spec_id,
            )
        )
    new_row = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": spec_id,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": added_records,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }

    base = next(
        (s for s in doc.get("snapshots", [])
         if s.get("snapshot-id") == base_id),
        None,
    )
    total_records = added_records
    if base is not None and not overwrite:
        try:
            total_records += int(
                base.get("summary", {}).get("total-records", "0") or 0
            ) - dropped_rows
        except ValueError:
            pass
    summary = C._with_totals(
        {
            "operation": (
                "overwrite" if (overwrite or dynamic) else "append"
            ),
            "added-data-files": str(len(files)),
            "added-records": str(added_records),
            **(
                {
                    "deleted-data-files": str(dropped_files),
                    "deleted-records": str(dropped_rows),
                    "removed-files-size": str(dropped_bytes),
                }
                if dynamic else {}
            ),
            "total-records": str(max(total_records, 0)),
            "added-files-size": str(added_bytes),
            **(extra_summary or {}),
        },
        doc, base_id,
        len(files) - dropped_files, added_bytes - dropped_bytes, 0,
        reset=overwrite,
    )

    list_path = os.path.join(
        mdir, f"snap-{snapshot_id}-{_uuid.uuid4().hex[:8]}.avro"
    )
    write_avro_file(
        list_path,
        C.MANIFEST_LIST_SCHEMA_V2,
        prior_rows + [new_row],
        meta={
            "snapshot-id": str(snapshot_id),
            "sequence-number": str(seq),
            "format-version": "2",
        },
    )
    snapshot = {
        "snapshot-id": snapshot_id,
        "parent-snapshot-id": base_id,
        "sequence-number": seq,
        "timestamp-ms": timestamp_ms,
        "manifest-list": list_path,
        "schema-id": doc.get("current-schema-id", 0),
        "summary": summary,
    }
    doc = dict(doc)
    if fv >= 3:
        first = int(doc.get("next-row-id", 0))
        snapshot["first-row-id"] = first
        doc["next-row-id"] = first + added_records
    doc["snapshots"] = doc.get("snapshots", []) + [snapshot]
    if branch is None:
        doc["current-snapshot-id"] = snapshot_id
        # spec: snapshot-log records changes of the CURRENT snapshot;
        # staged branch commits never move the main line
        doc["snapshot-log"] = doc.get("snapshot-log", []) + [
            {"timestamp-ms": timestamp_ms, "snapshot-id": snapshot_id}
        ]
    else:
        refs = dict(doc.get("refs", {}))
        refs[branch] = {"snapshot-id": snapshot_id, "type": "branch"}
        doc["refs"] = refs
    doc["last-sequence-number"] = seq
    doc["last-updated-ms"] = timestamp_ms
    doc.setdefault("sort-orders", [{"order-id": 0, "fields": []}])
    doc.setdefault("default-sort-order-id", 0)
    if extra_properties:
        doc["properties"] = {**doc.get("properties", {}), **extra_properties}
    C._commit_doc(table_dir, doc, prev_version)
    return snapshot
