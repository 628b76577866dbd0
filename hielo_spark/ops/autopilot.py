"""Recommendation → action autopilot over a real table directory.

The reference stops at recommending maintenance (analytics.rs:442-507
emits MaintenanceActionType rows; data.rs:315-321 names the actions);
this module closes the loop end-to-end with no Iceberg jar: analyze the
table's OWN metadata (snapshots + manifests), derive the same
recommendation categories, and execute each one through the commit plane
— compaction as a REPLACE snapshot, snapshot expiry as a metadata
commit, orphan reclamation as a distributed sweep.

Planning is metadata-only (one metadata.json read + manifest parse);
execution costs are the actions themselves. ``plan_maintenance`` is the
dry run, ``run_maintenance`` applies it and reports what changed.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

from ..metadata import commit as C
from ..metadata.manifests import files_from_manifest_list, read_manifest_list
from . import analysis

#: reference-shaped thresholds (analytics.rs small-file band edges; the
#: 64 MB target is the smallest "optimal" band edge there)
SMALL_FILE_BYTES = 32 * 1024 * 1024
TARGET_FILE_BYTES = 64 * 1024 * 1024
MIN_FILES_FOR_COMPACTION = 4
RETENTION_DAYS = 7
RETAIN_LAST = 3
MIN_MANIFESTS_FOR_REWRITE = 4
ORPHAN_GRACE_MS = 60 * 60 * 1000  # Iceberg's default safety window shape


def plan_maintenance(
    spark: SparkSession, table_dir: str, now_ms: int | None = None
) -> list[dict]:
    """Ordered action plan for a Hadoop-catalog table dir. Each entry:
    {action, reason, params} — the executable twin of the reference's
    recommendation rows."""
    now_ms = now_ms if now_ms is not None else int(time.time() * 1000)
    mpath = C.current_metadata_path(table_dir)
    if mpath is None:
        return []
    with open(mpath) as f:
        doc = json.load(f)
    snaps = sorted(doc.get("snapshots", []), key=lambda s: int(s["timestamp-ms"]))
    if not snaps:
        return []
    current = next(
        (s for s in snaps if s["snapshot-id"] == doc.get("current-snapshot-id")),
        snaps[-1],
    )
    # ONE manifest-list read, ONE files frame over every content kind,
    # ONE distributed groupBy(content) aggregate, collect <= 3 rows —
    # never the per-file rows themselves (a million-file table would
    # otherwise ship a million rows to the driver, four times)
    from pyspark.sql import functions as F

    mlist_path = current["manifest-list"].removeprefix("file:")
    manifest_rows = read_manifest_list(spark, mlist_path).collect()
    by_content = {
        int(r.content): r
        for r in files_from_manifest_list(
            spark, os.path.basename(table_dir), mlist_path,
            content=None, manifest_rows=manifest_rows,
        )
        .groupBy("content")
        .agg(
            F.count("*").alias("n"),
            F.sum("file_size_in_bytes").alias("bytes"),
            # v3 deletion vectors: many ENTRIES share one Puffin
            # container; maintenance cares about container count
            F.countDistinct("file_path").alias("nfiles"),
        )
        .collect()
    }
    plan: list[dict] = []

    n_files = int(by_content[0].n) if 0 in by_content else 0
    total_bytes = int(by_content[0].bytes or 0) if 0 in by_content else 0
    avg = total_bytes / n_files if n_files else 0
    n_pos_delete_files = int(by_content[1].n) if 1 in by_content else 0
    n_eq_delete_files = int(by_content[2].n) if 2 in by_content else 0
    n_delete_files = n_pos_delete_files + n_eq_delete_files
    # full data rewrite: small files, or EQUALITY deletes (their per-scan
    # anti-join can only be removed by baking them in — position deletes
    # have the cheaper dedicated compaction below)
    if (
        (n_files >= MIN_FILES_FOR_COMPACTION and avg < SMALL_FILE_BYTES)
        or n_eq_delete_files
    ):
        step = {
            "action": "rewrite_data_files",
            "reason": (
                f"{n_files} data files averaging {avg / 1048576:.1f} MiB"
                + (f" + {n_delete_files} merge-on-read delete files" if n_delete_files else "")
            ),
            "params": {"target_file_size_bytes": TARGET_FILE_BYTES},
        }
        # Puffin NDV statistics (S19) drive the compaction LAYOUT: sort
        # the rewrite by the highest-cardinality column, so output
        # files get tight DISJOINT bounds and point/range filters skip
        # whole files. A column whose NDV can't give each output file
        # its own key range (ndv < 2x the output file count estimate)
        # would produce overlapping bounds — skip the advice then.
        # Planner-facing read only (blob properties, no sketch decode).
        from ..metadata.puffin import ndv_of

        ndvs = ndv_of(table_dir)
        if ndvs:
            import math

            n_out = max(1, math.ceil(total_bytes / TARGET_FILE_BYTES))
            col, ndv = max(ndvs.items(), key=lambda kv: kv[1])
            if ndv >= 2 * n_out:
                step["params"]["sort_by"] = [col]
                step["reason"] += (
                    f"; sort by {col} (ndv {ndv} from Puffin statistics"
                    " — tight disjoint file bounds)"
                )
        plan.append(step)

    # delete-side compaction when the DATA files are healthy (no full
    # rewrite planned) but per-commit delete artifacts have piled up —
    # merging just the delete side is far cheaper than rewriting data.
    # v3 tables accumulate Puffin DV CONTAINERS (one per delete commit,
    # live blobs next to superseded garbage) → rewrite_deletion_vectors;
    # v2 tables accumulate position-delete parquet → the parquet
    # compactor.
    fv = int(doc.get("format-version", 2))
    n_dv_containers = int(by_content[1].nfiles) if 1 in by_content else 0
    if not plan and fv >= 3 and n_dv_containers >= 2:
        plan.append(
            {
                "action": "rewrite_deletion_vectors",
                "reason": (
                    f"{n_dv_containers} deletion-vector containers "
                    "accumulated (one per delete commit; superseded "
                    "blobs ride along as garbage)"
                ),
                "params": {},
            }
        )
    elif not plan and fv < 3 and n_pos_delete_files >= 2:
        plan.append(
            {
                "action": "rewrite_position_deletes",
                "reason": (
                    f"{n_pos_delete_files} position-delete files "
                    "accumulated (each scan reads all of them)"
                ),
                "params": {},
            }
        )

    # manifest consolidation: many tiny manifests slow scan planning.
    # Skipped when DATA compaction is planned — a REPLACE snapshot
    # leaves a single fresh manifest anyway, so the rewrite would be
    # redundant. (Position-delete compaction carries data manifests
    # forward, so it does NOT obviate this.) Counted from the
    # already-read manifest list, not a second read.
    if not any(a["action"] == "rewrite_data_files" for a in plan):
        n_data_manifests = sum(
            1 for m in manifest_rows if (m.content or 0) == 0
        )
        if n_data_manifests >= MIN_MANIFESTS_FOR_REWRITE:
            plan.append(
                {
                    "action": "rewrite_manifests",
                    "reason": (
                        f"{n_data_manifests} data manifests for one snapshot "
                        "(scan planning reads each)"
                    ),
                    "params": {},
                }
            )

    cutoff = now_ms - RETENTION_DAYS * 86_400_000
    expirable = [
        s for s in snaps[:-RETAIN_LAST]
        if int(s["timestamp-ms"]) < cutoff
        and s["snapshot-id"] != doc.get("current-snapshot-id")
    ]
    if expirable:
        plan.append(
            {
                "action": "expire_snapshots",
                "reason": f"{len(expirable)} snapshots older than {RETENTION_DAYS} days",
                "params": {"older_than_ms": cutoff, "retain_last": RETAIN_LAST},
            }
        )

    # orphan sweep is always planned LAST: compaction/expiry create the
    # unreferenced files it reclaims
    plan.append(
        {
            "action": "remove_orphan_files",
            "reason": "reclaim files no snapshot references (post-compaction/expiry)",
            "params": {"older_than_ms": now_ms - ORPHAN_GRACE_MS},
        }
    )
    return plan


def run_maintenance(
    spark: SparkSession,
    table_dir: str,
    now_ms: int | None = None,
    plan: list[dict] | None = None,
) -> dict:
    """Execute the plan (default: plan_maintenance's) and report what
    each action did. Safe ordering: compact → expire → sweep."""
    now_ms = now_ms if now_ms is not None else int(time.time() * 1000)
    plan = plan if plan is not None else plan_maintenance(spark, table_dir, now_ms)
    report: dict = {"table_dir": table_dir, "actions": []}
    for step in plan:
        entry = dict(step)
        if step["action"] == "rewrite_data_files":
            snap = C.rewrite_data_files(spark, table_dir, **step["params"])
            entry["result"] = {
                "snapshot_id": snap["snapshot-id"],
                "rewritten": int(snap["summary"]["rewritten-data-files"]),
                "added": int(snap["summary"]["added-data-files"]),
            }
        elif step["action"] == "rewrite_position_deletes":
            snap = C.rewrite_position_deletes(
                spark, table_dir, **step["params"]
            )
            entry["result"] = (
                {
                    "snapshot_id": snap["snapshot-id"],
                    "rewritten": int(snap["summary"]["rewritten-delete-files"]),
                    "added": int(snap["summary"]["added-delete-files"]),
                }
                if snap is not None
                else {"noop": True}
            )
        elif step["action"] == "rewrite_deletion_vectors":
            snap = C.rewrite_deletion_vectors(
                spark, table_dir, **step["params"]
            )
            entry["result"] = (
                {
                    "snapshot_id": snap["snapshot-id"],
                    "rewritten": int(snap["summary"]["rewritten-dv-files"]),
                    "added": int(snap["summary"]["added-dvs"]),
                }
                if snap is not None
                else {"noop": True}
            )
        elif step["action"] == "rewrite_manifests":
            snap = C.rewrite_manifests(spark, table_dir, **step["params"])
            entry["result"] = (
                {
                    "snapshot_id": snap["snapshot-id"],
                    "rewritten": int(snap["summary"]["rewritten-manifests"]),
                    "added": int(snap["summary"]["added-manifests"]),
                }
                if snap is not None
                else {"noop": True}
            )
        elif step["action"] == "expire_snapshots":
            expired = C.expire_snapshots(table_dir, **step["params"])
            entry["result"] = {"expired_snapshot_ids": expired}
        elif step["action"] == "remove_orphan_files":
            removed = analysis.remove_orphan_files(
                spark,
                os.path.join(table_dir, "data"),
                C.current_metadata_path(table_dir),
                older_than_ms=step["params"]["older_than_ms"],
            )
            entry["result"] = {"removed_files": len(removed)}
        else:
            raise ValueError(f"unknown maintenance action {step['action']!r}")
        report["actions"].append(entry)
    return report


#: Spark's default spark.sql.autoBroadcastJoinThreshold
BROADCAST_MAX_BYTES = 10 * 1024 * 1024
#: rows-per-key ratio above which a shuffle join key counts as skewed
SKEW_ROWS_PER_KEY = 10_000


def advise_join_strategy(
    table_dir: str,
    key: str,
    broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
    skew_rows_per_key: int = SKEW_ROWS_PER_KEY,
) -> dict:
    """Metadata-only join planning advice for joining ON ``key``
    against this table — the Puffin NDV statistics plane (S19) feeding
    an actual decision instead of just existing:

    * ``broadcast`` when the table's live bytes (snapshot summary
      ``total-files-size``) fit the broadcast threshold — the planner
      answer Spark itself would reach, but available BEFORE any scan,
      from one metadata.json read;
    * otherwise ``shuffle``, with ``skew: True`` when
      total-records / NDV(key) exceeds ``skew_rows_per_key`` — the
      high-rows-per-key shape where a plain shuffle join stalls on a
      few hot partitions and the caller should salt (operators/skew.py)
      or rely on AQE skew-join.

    No statistics → conservative shuffle advice with ``ndv: None``
    (never a guess presented as knowledge)."""
    from ..metadata.commit import _load_doc
    from ..metadata.puffin import ndv_of

    doc = _load_doc(table_dir)[0]
    cur = next(
        (
            s for s in doc.get("snapshots", [])
            if s.get("snapshot-id") == doc.get("current-snapshot-id")
        ),
        None,
    )
    summary = (cur or {}).get("summary", {})
    total_bytes = int(summary.get("total-files-size", 0) or 0)
    total_records = int(summary.get("total-records", 0) or 0)
    ndv = ndv_of(table_dir, key).get(key)
    if total_bytes and total_bytes <= broadcast_max_bytes:
        return {
            "strategy": "broadcast",
            "reason": (
                f"live table bytes {total_bytes} <= "
                f"{broadcast_max_bytes} broadcast threshold"
            ),
            "ndv": ndv,
        }
    if ndv:
        per_key = total_records / ndv
        if per_key > skew_rows_per_key:
            return {
                "strategy": "shuffle",
                "skew": True,
                "reason": (
                    f"{total_records} rows over ndv {ndv} ≈ "
                    f"{per_key:.0f} rows/key > {skew_rows_per_key} — "
                    "salt the key or enable AQE skew join"
                ),
                "ndv": ndv,
            }
        return {
            "strategy": "shuffle",
            "skew": False,
            "reason": (
                f"{total_records} rows over ndv {ndv} ≈ "
                f"{per_key:.0f} rows/key — even shuffle"
            ),
            "ndv": ndv,
        }
    return {
        "strategy": "shuffle",
        "skew": None,
        "reason": "no NDV statistics for the key; conservative shuffle",
        "ndv": None,
    }


def advised_join(
    spark,
    df,
    table_dir: str,
    key: str,
    salt_buckets: int = 16,
    broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
    skew_rows_per_key: int = SKEW_ROWS_PER_KEY,
    **read_kwargs,
):
    """Equi-join ``df`` with a no-jar table ON ``key``, the physical
    strategy picked by :func:`advise_join_strategy` — the statistics
    plane EXECUTING its advice instead of just returning it:

    * ``broadcast`` advice → explicit ``F.broadcast`` hint on the table
      side (the plan flips to BroadcastHashJoin even where Spark's own
      size estimate wouldn't, because the decision comes from the
      snapshot summary before any scan);
    * skew-flagged shuffle advice → :func:`operators.skew.salted_join`
      (the big side salted, the table side replicated per bucket — the
      written NDV statistics deciding the plan);
    * even-shuffle / no-statistics advice → plain join, Catalyst/AQE
      free to pick.

    Result always equals ``df.join(read_table(...), key)``;
    ``read_kwargs`` pass through to read_table (where/time travel)."""
    from pyspark.sql import functions as F

    from ..metadata.manifests import read_table
    from ..operators.skew import salted_join

    advice = advise_join_strategy(
        table_dir, key, broadcast_max_bytes, skew_rows_per_key
    )
    small = read_table(spark, table_dir, **read_kwargs)
    if advice["strategy"] == "broadcast":
        return df.join(F.broadcast(small), key)
    if advice.get("skew"):
        return salted_join(df, small, key, salt_buckets=salt_buckets)
    return df.join(small, key)
