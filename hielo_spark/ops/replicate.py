"""Incremental CDC replication between two no-jar Iceberg tables.

The reference exposes table metadata and snapshot lineage read-only;
this operator closes the loop the way production CDC pipelines do
(Iceberg's create_changelog_view → MERGE apply): read the SOURCE
table's changelog since the last replicated snapshot and apply it to a
DESTINATION table as merge-on-read commits, snapshot by snapshot, with
an exactly-once watermark stored in the destination's table properties.

Semantics: ``keys`` must uniquely identify rows in both tables (the
standard CDC primary-key contract — applying a full-row multiset diff
without keys cannot target duplicates). Per source snapshot, in
lineage order:

* keys deleted and NOT re-inserted → ``merge_into(when_matched=
  'delete')``;
* inserted/updated rows → ``merge_into(when_matched='update',
  when_not_matched='insert')`` (an overwrite's DELETE+INSERT pair for
  the same key collapses into the upsert);
* the watermark property ``hielo.replicate.<src-uuid>.last-snapshot-id``
  advances with the snapshot's LAST commit, so a crash mid-snapshot
  re-applies idempotently (the delete merge no-ops, the upsert
  re-asserts the same rows) and never skips or doubles a snapshot.

Scale: the changelog is planned from metadata (appends scan only their
own new files; overwrites pay the same multiset diff Iceberg does);
applies are merge_into's distributed semi/anti joins + MOR commits —
no driver-side row movement. The per-call collect is one row per
REPLICATED SNAPSHOT (ordinal list), never data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from ..metadata import commit as C
from ..metadata.manifests import read_changelog

_META_COLS = ("_change_type", "_commit_snapshot_id", "_change_ordinal")


def _watermark_key(src_doc: dict, src_dir: str) -> str:
    uid = src_doc.get("table-uuid") or os.path.basename(
        os.path.normpath(src_dir)
    )
    return f"hielo.replicate.{uid}.last-snapshot-id"


def _follow_source_schema(
    src_doc: dict, last_snap_id: int, dst_table_dir: str,
    keys: list[str],
) -> None:
    """Replay the source's schema evolution since the watermark onto
    the destination (one ``update_schema`` commit), diffing the
    watermark snapshot's schema against the current one BY FIELD ID —
    renames keep their id, so ``a→b→c`` between calls collapses to one
    ``a→c``. Destination column names stay in sync with the source by
    induction: the bootstrap copied them and every replication replays
    the subsequent changes, so a source rename ``{old: new}`` addresses
    the right destination column without any cross-table field-id map.
    Dropping a replication KEY column is refused loudly — the CDC
    contract (keys uniquely identify rows in both tables) would be
    silently broken otherwise."""
    from ..metadata.types import iceberg_to_ddl

    schemas = {
        s.get("schema-id"): s for s in src_doc.get("schemas", [])
    }
    cur_sid = src_doc.get("current-schema-id", 0)
    by_id = {
        int(s["snapshot-id"]): s for s in src_doc.get("snapshots", [])
    }
    old_sid = (by_id.get(int(last_snap_id)) or {}).get(
        "schema-id", cur_sid
    )
    if old_sid == cur_sid:
        return
    old = {
        f["id"]: f
        for f in schemas.get(old_sid, {}).get("fields", [])
    }
    new = {
        f["id"]: f
        for f in schemas.get(cur_sid, {}).get("fields", [])
    }
    add: list[tuple[str, str]] = []
    drop: list[str] = []
    rename: dict[str, str] = {}
    widen: dict[str, str] = {}
    for fid, f in new.items():
        if fid not in old:
            add.append(
                (f["name"], iceberg_to_ddl(f.get("type", "string")))
            )
            continue
        o = old[fid]
        if o["name"] != f["name"]:
            rename[o["name"]] = f["name"]
        if o.get("type") != f.get("type"):
            # widen keys use post-rename names (update_schema contract)
            widen[f["name"]] = iceberg_to_ddl(f.get("type", "string"))
    for fid, o in old.items():
        if fid not in new:
            if o["name"] in keys:
                raise ValueError(
                    f"source dropped replication key column "
                    f"{o['name']!r} — the CDC key contract is broken; "
                    "re-bootstrap with a new key set"
                )
            drop.append(o["name"])
    if add or drop or rename or widen:
        C.update_schema(
            dst_table_dir, add=add or None, drop=drop or None,
            rename=rename or None, widen=widen or None,
        )


def replicate_changes(
    spark: SparkSession,
    src_table_dir: str,
    dst_table_dir: str,
    keys: list[str],
    max_snapshots: int | None = None,
) -> dict:
    """Replicate source commits the destination hasn't seen yet.
    First call BOOTSTRAPS: the source's current state is appended as
    one snapshot and the watermark set. Returns a report:
    ``{"bootstrapped": bool, "applied": [src snapshot ids],
    "watermark": last replicated src snapshot id}``."""
    if not keys:
        raise ValueError("replication requires key columns")
    src_mpath = C.current_metadata_path(src_table_dir)
    if src_mpath is None:
        raise ValueError(f"no table metadata under {src_table_dir}")
    with open(src_mpath) as f:
        src_doc = json.load(f)
    src_current = src_doc.get("current-snapshot-id")
    if src_current is None:
        raise ValueError("source table has no current snapshot")
    wm_key = _watermark_key(src_doc, src_table_dir)

    dst_mpath = C.current_metadata_path(dst_table_dir)
    last = None
    if dst_mpath is not None:
        with open(dst_mpath) as f:
            dst_doc = json.load(f)
        v = dst_doc.get("properties", {}).get(wm_key)
        last = int(v) if v is not None else None

    if last is None:
        # bootstrap: one snapshot carrying the source's current state
        from ..metadata.manifests import read_data_at_snapshot

        full = read_data_at_snapshot(spark, src_mpath)
        missing = [k for k in keys if k not in full.columns]
        if missing:
            raise ValueError(f"key columns missing from source: {missing}")
        C.append(
            spark, dst_table_dir, full,
            extra_properties={wm_key: str(src_current)},
        )
        return {
            "bootstrapped": True,
            "applied": [int(src_current)],
            "watermark": int(src_current),
        }

    if last == src_current:
        return {"bootstrapped": False, "applied": [],
                "watermark": int(last)}

    # replicate along the LINEAGE, not the changelog's row-bearing
    # snapshots: a replace (compaction) emits no rows but must still
    # advance the watermark, or the range would be re-planned forever.
    # The walk runs BEFORE the changelog read so an expired lineage
    # fails with re-bootstrap guidance, not a changelog lookup error.
    by_id = {int(s["snapshot-id"]): s
             for s in src_doc.get("snapshots", [])}
    if last not in by_id:
        raise ValueError(
            f"watermark snapshot {last} has been expired from the "
            "source metadata — re-bootstrap required (drop the "
            "destination or clear its watermark property)"
        )
    chain = []
    cur = int(src_current)
    while cur != last:
        chain.append(cur)
        snap = by_id.get(cur)
        if snap is None:
            raise ValueError(
                f"source lineage expired past watermark {last}: snapshot "
                f"{cur} is no longer in the source metadata — "
                "re-bootstrap required (drop the destination or clear "
                "its watermark property)"
            )
        parent = snap.get("parent-snapshot-id")
        if parent is None:
            # walked to the root without meeting the watermark: the
            # watermark snapshot itself was expired (or the source was
            # recreated) — replaying from the root would double-apply
            raise ValueError(
                f"source lineage cannot reach watermark {last} from "
                f"{src_current} (watermark snapshot expired or source "
                "recreated) — re-bootstrap required"
            )
        cur = int(parent)
    chain.reverse()  # oldest first
    if max_snapshots is not None:
        chain = chain[:max_snapshots]
    # schema evolution mid-stream: the changelog renders under the
    # source's CURRENT schema, so the destination must follow the
    # source's evolution since the watermark before any batch applies
    _follow_source_schema(src_doc, last, dst_table_dir, keys)
    changes = read_changelog(
        spark, src_mpath, from_snapshot_id=last,
        to_snapshot_id=src_current,
    )
    applied = []
    for snap_id in chain:
        batch = changes.filter(changes["_commit_snapshot_id"] == snap_id)
        data_cols = [c for c in batch.columns if c not in _META_COLS]
        ins = batch.filter(batch["_change_type"] == "INSERT").select(
            *data_cols
        )
        del_keys = (
            batch.filter(batch["_change_type"] == "DELETE")
            .select(*keys)
            .join(ins.select(*keys), keys, "left_anti")  # pure deletes
            .distinct()
        )
        marker = {wm_key: str(int(snap_id))}
        n_ins = ins.limit(1).count()
        n_del = del_keys.limit(1).count()
        marker_committed = False
        if n_ins:
            # ONE atomic destination snapshot per source snapshot: the
            # source snapshot's pure deletes ride the same commit as
            # its upserts (extra_delete_keys), so destination readers
            # never observe a deletes-applied/inserts-missing
            # intermediate state
            snap = C.merge_into(
                spark, dst_table_dir, ins, on=keys,
                when_matched="update", when_not_matched="insert",
                extra_delete_keys=del_keys if n_del else None,
                extra_properties=marker,
            )
            marker_committed = snap is not None
        elif n_del:
            snap = C.merge_into(
                spark, dst_table_dir, del_keys, on=keys,
                when_matched="delete", when_not_matched=None,
                extra_properties=marker,
            )
            marker_committed = snap is not None
        if not marker_committed:
            # replace/no-op snapshots — and idempotent re-applies whose
            # merges no-op (crash recovery) — still advance the
            # watermark, or the same snapshot would re-apply forever
            C.set_table_properties(dst_table_dir, marker)
        applied.append(int(snap_id))
    # snapshots past the slice (max_snapshots) stay unapplied; the
    # watermark sits at the last APPLIED one, so the next call resumes
    wm = applied[-1] if applied else int(last)
    return {"bootstrapped": False, "applied": applied, "watermark": wm}
