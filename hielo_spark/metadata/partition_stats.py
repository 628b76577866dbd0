"""Iceberg partition statistics files (spec "Partition Statistics").

The spec registers per-snapshot partition-level aggregates in the
table metadata's ``partition-statistics`` list — ``{snapshot-id,
statistics-path, file-size-in-bytes}`` — pointing at ONE sorted
parquet file of per-partition rows (data/delete record+file counts and
bytes). Engines use it to answer partition-level questions (SHOW
PARTITIONS, skew inspection, planning heuristics) without walking
manifests.

Spec fidelity: the file carries exactly the spec's fields, each
written with its permanently-assigned PARQUET field id so a
field-id-resolving reader consumes it without name mapping —
``1 partition`` (a TYPED struct of the unified partition tuple across
all specs, child field ids = the partition field-ids from
metadata.json), ``2 spec_id``, ``3 data_record_count``,
``4 data_file_count``, ``5 total_data_file_size_in_bytes``,
``6 position_delete_record_count``, ``7 position_delete_file_count``,
``8 equality_delete_record_count``, ``9 equality_delete_file_count``,
``10 total_record_count`` (null when delete overlap could make it
inexact — see below), ``11 last_updated_at``,
``12 last_updated_snapshot_id``. Delete counts land under their TRUE
partitions because the delete writers stamp partition values on
delete files (hive-partitioned position deletes, key-derived equality
deletes, DV entries inheriting their referenced data file's
partition); un-stamped legacy/global delete files aggregate under the
all-null partition tuple.

Time-transform partition values (years/months/days/hours) are emitted
in the SPEC's encodings — int years/months/hours from epoch, date for
day — converted from the canonical strings ("2024", "2024-03-05") the
engine records in every other plane (those remain the display layer).
``spec_id`` (field 2) is per partition: the spec id of the most
recently updated entry in that partition, so mixed-spec tables
attribute rows to their true spec. Honest residual deviation:
``total_record_count`` is emitted only where provably exact (no
equality deletes, and position deletes either v3 DVs — merged, one
per file — or at most one v2 delete file, so no double-counted
positions). Unpartitioned tables raise: the unified partition type is
empty and parquet cannot represent a zero-field group (Iceberg's own
PartitionStatsHandler requires a partitioned table too).

Scale: the aggregate is one distributed groupBy over the files frame
(rows = live files, output rows = live partitions); only the final
single-file write is serial — the format REQUIRES one sorted file, and
its row count is the partition count, planning-plane size.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

#: spec field name → permanently-assigned field id
_STATS_FIELD_IDS = {
    "partition": 1,
    "spec_id": 2,
    "data_record_count": 3,
    "data_file_count": 4,
    "total_data_file_size_in_bytes": 5,
    "position_delete_record_count": 6,
    "position_delete_file_count": 7,
    "equality_delete_record_count": 8,
    "equality_delete_file_count": 9,
    "total_record_count": 10,
    "last_updated_at": 11,
    "last_updated_snapshot_id": 12,
}


def _unified_partition_fields(
    doc: dict,
) -> list[tuple[str, str, int, str]]:
    """``[(name, spark_ddl_type, partition_field_id, transform)]`` of
    the spec's unified partition tuple: every partition field across
    ALL specs, ordered by field-id. Value types follow the SPEC's
    encodings: identity/truncate → the source column's type, bucket →
    int, year/month/hour → int (from epoch), day → date."""
    from .types import iceberg_to_ddl

    id2type: dict[int, object] = {}
    for s in doc.get("schemas", []):
        for f in s.get("fields", []):
            id2type.setdefault(f["id"], f.get("type", "string"))
    cur = next(
        (
            s for s in doc.get("schemas", [])
            if s.get("schema-id") == doc.get("current-schema-id", 0)
        ),
        {},
    )
    for f in cur.get("fields", []):
        id2type[f["id"]] = f.get("type", "string")
    from .commit import _r102_spark_type

    seen: dict[int, tuple[str, str, int, str]] = {}
    for spec in sorted(
        doc.get("partition-specs") or [], key=lambda s: s.get("spec-id", 0)
    ):
        for f in spec.get("fields", []):
            fid = int(f.get("field-id", 1000))
            if fid in seen:
                continue
            tr = str(f.get("transform", "identity"))
            # ONE copy of the spec's transform→result-type table
            # (commit.py's r102 writer uses the same mapping); identity
            # and truncate resolve the SOURCE type through the full
            # schema history here (a dropped source column keeps its
            # historical type rather than string-fallback)
            if tr == "identity" or tr.startswith("truncate"):
                t = iceberg_to_ddl(
                    id2type.get(f.get("source-id"), "string")
                )
            else:
                t = _r102_spark_type(
                    tr, str(f.get("name", "")), f.get("source-id"),
                    doc, None,
                )
            seen[fid] = (str(f.get("name", f"p{fid}")), t, fid, tr)
    return [seen[fid] for fid in sorted(seen)]


def _spec_partition_value(pv, name: str, transform: str, ddl: str):
    """The spec-typed column for one unified-tuple field: the engine
    records time-transform values as canonical strings ("2024",
    "2024-03", "2024-03-05", "2024-03-05-14") in every metadata plane,
    so the stats file converts them to the spec's encodings here
    (int years/months/hours since the 1970 epoch, date for day) —
    pure string/date arithmetic, no session-TZ sensitivity."""
    from pyspark.sql import functions as F

    raw = F.when(
        pv[name] == "__HIVE_DEFAULT_PARTITION__", None
    ).otherwise(pv[name])
    if transform == "year":
        return (raw.cast("int") - F.lit(1970)).alias(name)
    if transform == "month":
        parts = F.split(raw, "-")
        return (
            (parts[0].cast("int") - F.lit(1970)) * F.lit(12)
            + (parts[1].cast("int") - F.lit(1))
        ).alias(name)
    if transform == "day":
        return F.to_date(raw, "yyyy-MM-dd").alias(name)
    if transform == "hour":
        # pure date arithmetic (datediff is TZ-free) — a session TZ
        # drift must not shift the ordinal the pure-Python r102 writer
        # computes for the same value
        parts = F.split(raw, "-")
        d = F.to_date(F.concat_ws("-", parts[0], parts[1], parts[2]))
        return (
            F.datediff(d, F.to_date(F.lit("1970-01-01"))) * F.lit(24)
            + parts[3].cast("int")
        ).cast("int").alias(name)
    return raw.cast(ddl).alias(name)


def _with_stats_field_ids(tbl, pfields: list[tuple[str, str, int]]):
    """Stamp the spec's PARQUET field ids onto the arrow schema: the
    top-level stats fields get ids 1-12, the partition struct's
    children get their partition field-ids from metadata.json."""
    import pyarrow as pa

    out = []
    for f in tbl.schema:
        if f.name == "partition":
            kids = [
                pa.field(
                    child.name, child.type,
                    metadata={b"PARQUET:field_id": str(fid).encode()},
                )
                for child, (_n, _t, fid, _tr) in zip(list(f.type), pfields)
            ]
            f = pa.field(
                "partition", pa.struct(kids),
                metadata={b"PARQUET:field_id": b"1"},
            )
        else:
            f = f.with_metadata(
                {b"PARQUET:field_id":
                 str(_STATS_FIELD_IDS[f.name]).encode()}
            )
        out.append(f)
    return tbl.cast(pa.schema(out))


def write_partition_statistics(
    spark: SparkSession,
    table_dir: str,
    timestamp_ms: int | None = None,
) -> dict:
    """Compute the CURRENT snapshot's partition statistics and register
    the file under metadata.json ``partition-statistics`` (replacing a
    prior entry for the same snapshot). Returns the registered entry.
    Raises on unpartitioned tables (empty unified partition type)."""
    from pyspark.sql import functions as F

    from .commit import _commit_doc, _load_doc, current_metadata_path
    from .manifests import files_from_manifest_list

    doc, prev_version = _load_doc(table_dir)
    snap_id = doc.get("current-snapshot-id")
    if snap_id is None:
        raise ValueError(
            "cannot write partition statistics: table has no snapshot"
        )
    pfields = _unified_partition_fields(doc)
    if not pfields:
        raise ValueError(
            "partition statistics require a partitioned table (the "
            "unified partition type is empty — nothing to key rows by)"
        )
    fv = int(doc.get("format-version", 2))
    snap = next(
        s for s in doc.get("snapshots", []) if s["snapshot-id"] == snap_id
    )
    timestamp_ms = (
        timestamp_ms if timestamp_ms is not None
        else int(time.time() * 1000)
    )
    files = files_from_manifest_list(
        spark, os.path.basename(table_dir),
        snap["manifest-list"].removeprefix("file:"), content=None,
        with_spec_id=True,
    )
    pv = F.coalesce(
        "partition_values", F.create_map().cast("map<string,string>")
    )
    part_struct = F.struct(
        *[
            _spec_partition_value(pv, name, tr, t)
            for name, t, _fid, tr in pfields
        ]
    )
    agg = (
        files.withColumn("partition", part_struct)
        .groupBy("partition")
        .agg(
            F.sum(F.when(F.col("content") == 0, F.col("record_count"))
                  .otherwise(0)).alias("data_record_count"),
            F.sum(F.when(F.col("content") == 0, 1).otherwise(0))
            .cast("int").alias("data_file_count"),
            F.sum(F.when(F.col("content") == 0,
                         F.col("file_size_in_bytes")).otherwise(0))
            .alias("total_data_file_size_in_bytes"),
            F.sum(F.when(F.col("content") == 1, F.col("record_count"))
                  .otherwise(0)).alias("position_delete_record_count"),
            F.sum(F.when(F.col("content") == 1, 1).otherwise(0))
            .cast("int").alias("position_delete_file_count"),
            F.sum(F.when(F.col("content") == 2, F.col("record_count"))
                  .otherwise(0)).alias("equality_delete_record_count"),
            F.sum(F.when(F.col("content") == 2, 1).otherwise(0))
            .cast("int").alias("equality_delete_file_count"),
            F.max("sequence_number").alias("_last_seq"),
            # field 2: per-partition spec id — the spec of the most
            # recently updated entry, so mixed-spec tables attribute
            # each partition to its true (current-for-it) spec instead
            # of the table default
            F.max_by("spec_id", F.coalesce("sequence_number", F.lit(0)))
            .cast("int").alias("_spec_id"),
        )
    )
    # total_record_count (field 10, optional) only where provably
    # exact: no equality deletes (key counts ≠ affected rows), and
    # position deletes either v3 DVs (merged, one live DV per file) or
    # at most one v2 delete file (no double-counted positions)
    exact = (F.col("equality_delete_record_count") == 0) & (
        F.lit(fv >= 3) | (F.col("position_delete_file_count") <= 1)
    )
    ordered = (
        agg.select(
            "partition",
            F.coalesce(
                "_spec_id", F.lit(int(doc.get("default-spec-id", 0)))
            ).cast("int").alias("spec_id"),
            "data_record_count",
            "data_file_count",
            "total_data_file_size_in_bytes",
            "position_delete_record_count",
            "position_delete_file_count",
            "equality_delete_record_count",
            "equality_delete_file_count",
            F.when(
                exact,
                F.col("data_record_count")
                - F.col("position_delete_record_count"),
            ).cast("long").alias("total_record_count"),
            F.lit(int(timestamp_ms)).alias("last_updated_at"),
            "_last_seq",
        )
        # the spec mandates ONE file, sorted by partition — the
        # aggregate above is distributed; only this final write is
        # serial, and its row count is the live-partition count
        .orderBy("partition")
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = ordered.toArrow()
    # field 12: the snapshot that last updated each partition — mapped
    # from the aggregated max sequence number (planning-plane dict)
    seq2snap = {
        int(s.get("sequence-number", 0)): int(s["snapshot-id"])
        for s in doc.get("snapshots", [])
    }
    lus = pa.array(
        [
            seq2snap.get(int(s)) if s is not None else None
            for s in tbl.column("_last_seq").to_pylist()
        ],
        type=pa.int64(),
    )
    tbl = tbl.remove_column(
        tbl.column_names.index("_last_seq")
    ).append_column("last_updated_snapshot_id", lus)
    tbl = _with_stats_field_ids(tbl, pfields)
    path = os.path.join(
        table_dir, "metadata",
        f"partition-stats-{snap_id}-{_uuid_hex()}.parquet",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)
    entry = {
        "snapshot-id": int(snap_id),
        "statistics-path": path,
        "file-size-in-bytes": os.path.getsize(path),
    }
    # re-load for the commit (the aggregate ran a Spark job; another
    # writer may have advanced the version — last-writer-wins on the
    # stats entry is Iceberg's own behavior for stats commits)
    doc, prev_version = _load_doc(table_dir)
    doc = dict(doc)
    prior = [
        e for e in doc.get("partition-statistics", [])
        if e.get("snapshot-id") != int(snap_id)
    ]
    doc["partition-statistics"] = prior + [entry]
    doc["last-updated-ms"] = timestamp_ms
    _commit_doc(table_dir, doc, prev_version)
    assert current_metadata_path(table_dir) is not None
    return entry


def _uuid_hex() -> str:
    import uuid

    return uuid.uuid4().hex[:8]


def read_partition_statistics(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """The registered partition-statistics frame for ``snapshot_id``
    (default: the current snapshot). Raises with guidance when none is
    registered — statistics are explicit commits, never recomputed
    silently on read."""
    from .commit import _load_doc

    doc = _load_doc(table_dir)[0]
    sid = (
        int(snapshot_id) if snapshot_id is not None
        else doc.get("current-snapshot-id")
    )
    entry = next(
        (
            e for e in doc.get("partition-statistics", [])
            if e.get("snapshot-id") == sid
        ),
        None,
    )
    if entry is None:
        raise ValueError(
            f"no partition statistics registered for snapshot {sid} "
            "(run write_partition_statistics)"
        )
    return spark.read.parquet(entry["statistics-path"])


def partition_skew_report(
    spark: SparkSession,
    table_dir: str,
    hot_factor: float = 4.0,
) -> list[dict]:
    """Planning advice from the partition-statistics plane: partitions
    whose live data_record_count exceeds ``hot_factor`` × the median —
    the hot-partition shape where a partition-aligned job stalls on a
    few tasks and the caller should salt, split, or sort-compact those
    partitions. One percentile + one filtered collect of only the hot
    rows (bounded by how many partitions are actually hot)."""
    from pyspark.sql import functions as F

    stats = read_partition_statistics(spark, table_dir)
    med = stats.agg(
        F.percentile_approx("data_record_count", 0.5).alias("m")
    ).collect()[0].m
    if not med:
        return []
    hot = (
        stats.filter(F.col("data_record_count") > float(hot_factor) * med)
        .select("partition", "data_record_count")
        .collect()
    )
    # display layer: the stats FILE stores the spec's time-transform
    # encodings (int ordinals from epoch); the advisory report renders
    # the engine's canonical strings ("2024-03") back for humans
    from .commit import _load_doc

    tr_of = {
        name: tr
        for name, _t, _fid, tr in _unified_partition_fields(
            _load_doc(table_dir)[0]
        )
    }

    def _display(name, v):
        if v is None:
            return None
        tr = tr_of.get(name)
        if tr == "year":
            return str(1970 + int(v))
        if tr == "month":
            y, m = divmod(int(v), 12)
            return f"{1970 + y}-{m + 1:02d}"
        if tr == "hour":
            import datetime as _dt

            d, h = divmod(int(v), 24)
            day = _dt.date(1970, 1, 1) + _dt.timedelta(days=d)
            return f"{day.isoformat()}-{h:02d}"
        return v  # identity/bucket/truncate/day (day is already a date)

    return [
        {
            "partition": (
                {k: _display(k, v)
                 for k, v in r.partition.asDict().items()}
                if r.partition else {}
            ),
            "data_record_count": int(r.data_record_count),
            "median_record_count": int(med),
            "reason": (
                f"{int(r.data_record_count)} rows > {hot_factor}x "
                f"median {int(med)} — salt or split this partition"
            ),
        }
        for r in hot
    ]
