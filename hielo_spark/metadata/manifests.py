"""Iceberg manifest-list / manifest readers without the Iceberg runtime.

SURVEY §2.1 S7's deepest blocked piece: the reference loads snapshots AND
their file inventory from the catalog (iceberg_adapter.rs:11-65); Spark's
``t.files`` / ``t.manifests`` metadata tables need the
iceberg-spark-runtime jar, which this environment cannot obtain (verified
rounds 1-3: no jar on disk, no network). The *data* needed is just Avro
container files referenced from the table-metadata JSON — and Spark's own
classpath already ships the Apache Avro core library (avro-1.12.1.jar,
used internally by Spark). This module drives that JVM library through
py4j to parse real Iceberg v1/v2 manifest lists and manifests, producing
the same frames the metadata operators consume (``files_from_orders``
shape → `files.py::file_size_histogram` runs unchanged on real tables).

Scale note — deliberately driver-side: manifest parsing is the *planning*
plane. A manifest list is one row per manifest (~KBs); manifests cover
thousands of data files each (a million-file table ≈ 100 manifests). Every
query engine's planner reads these centrally before distributing work; at
larger counts the distributed path is `spark.read.format("avro")`
(spark-avro jar) or the Iceberg metadata tables themselves — both
jar-gated here. The JVM objects never cross to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

# Iceberg spec field names; v1/v2 disagree on the count columns
# (https://iceberg.apache.org/spec/#manifest-lists — public spec).
_COUNT_ALIASES = {
    "added_files_count": ("added_files_count", "added_data_files_count"),
    "existing_files_count": ("existing_files_count", "existing_data_files_count"),
    "deleted_files_count": ("deleted_files_count", "deleted_data_files_count"),
}


def _py(v):
    """py4j value → Python scalar (Utf8/GenericEnumSymbol → str)."""
    if v is None or isinstance(v, (int, float, bool, str)):
        return v
    return v.toString()


def _get(rec, name):
    """Null-safe field access: Avro 1.12's Record.get THROWS on fields
    absent from the writer schema (older versions returned null)."""
    if rec.getSchema().getField(name) is None:
        return None
    return rec.get(name)


def _avro_reader(spark: SparkSession, path: str):
    jvm = spark._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    return jvm.org.apache.avro.file.DataFileReader.openReader(
        jvm.java.io.File(path), reader
    )


def read_manifest_list(spark: SparkSession, path: str) -> DataFrame:
    """One row per manifest in an Iceberg manifest-list Avro file."""
    dfr = _avro_reader(spark, path)
    rows = []
    try:
        while dfr.hasNext():
            r = dfr.next()

            def count(name):
                for alias in _COUNT_ALIASES[name]:
                    v = _get(r, alias)
                    if v is not None:
                        return int(v)
                return None

            content = _py(_get(r, "content"))
            rows.append(
                (
                    _py(_get(r, "manifest_path")),
                    _py(_get(r, "manifest_length")),
                    _py(_get(r, "partition_spec_id")),
                    _py(_get(r, "added_snapshot_id")),
                    count("added_files_count"),
                    count("existing_files_count"),
                    count("deleted_files_count"),
                    int(content) if content is not None else 0,
                )
            )
    finally:
        dfr.close()
    return spark.createDataFrame(
        rows,
        "manifest_path string, manifest_length long, partition_spec_id int, "
        "added_snapshot_id long, added_files_count int, existing_files_count int, "
        "deleted_files_count int, content int",
    )


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """One row per data-file entry in an Iceberg manifest Avro file.

    ``status``: 0 existing / 1 added / 2 deleted (spec); deleted entries
    are kept so callers can filter — the live file set is status != 2.
    """
    dfr = _avro_reader(spark, path)
    rows = []
    try:
        while dfr.hasNext():
            r = dfr.next()
            df_rec = _get(r, "data_file")
            fcontent = _py(_get(df_rec, "content"))
            rows.append(
                (
                    int(_py(_get(r, "status"))),
                    _py(_get(r, "snapshot_id")),
                    _py(_get(df_rec, "file_path")),
                    _py(_get(df_rec, "file_format")),
                    int(_py(_get(df_rec, "record_count"))),
                    int(_py(_get(df_rec, "file_size_in_bytes"))),
                    int(fcontent) if fcontent is not None else 0,
                )
            )
    finally:
        dfr.close()
    return spark.createDataFrame(
        rows,
        "status int, snapshot_id long, file_path string, file_format string, "
        "record_count long, file_size_in_bytes long, content int",
    )


def _resolve(base_path: str, p: str) -> str:
    """Manifest paths are absolute URIs in real tables; tolerate relative
    fixture paths and the file: scheme."""
    import os

    local = p[len("file:"):] if p.startswith("file:") else p
    if not os.path.isabs(local):
        local = os.path.join(os.path.dirname(base_path), local)
    return local


def files_from_manifest_list(
    spark: SparkSession,
    table_name: str,
    manifest_list_path: str,
    content: int = 0,
) -> DataFrame:
    """The ``t.files`` frame of a snapshot, straight from its manifest
    list: parse the list, parse each referenced manifest, keep live
    entries (status != 2 deleted) of the requested ``content`` kind
    (0 data files — the default, `file_size_histogram`-compatible;
    1 position deletes; 2 equality deletes), and emit the canonical
    files shape."""
    from pyspark.sql import functions as F

    want_delete_manifests = content != 0
    mlist = read_manifest_list(spark, manifest_list_path).collect()
    out = None
    for m in mlist:
        # manifest-level content (v2): 0 data / 1 deletes — skip whole
        # manifests of the wrong kind before parsing them
        if (m.content == 1) != want_delete_manifests:
            continue
        entries = read_manifest(spark, _resolve(manifest_list_path, m.manifest_path))
        out = entries if out is None else out.unionByName(entries)
    if out is None:
        return spark.createDataFrame(
            [], "table_name string, file_path string, file_size_in_bytes long, record_count long"
        )
    return (
        out.filter((F.col("status") != 2) & (F.col("content") == content))
        .select(
            F.lit(table_name).alias("table_name"),
            "file_path",
            "file_size_in_bytes",
            "record_count",
        )
    )


def read_data_at_snapshot(
    spark: SparkSession,
    metadata_json_path: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
) -> DataFrame:
    """Executable time travel without the Iceberg runtime (S12): pick a
    snapshot from the table-metadata JSON (by id, by ``as_of_ms`` — the
    latest snapshot committed at or before that instant, mirroring
    ``TIMESTAMP AS OF`` — or the latest), resolve its manifest list to
    the live data-file paths, read those parquet files directly, and
    apply the snapshot's merge-on-read DELETE files:

    * position deletes — parquet rows of (file_path, pos) — anti-join
      against the data on (scheme-normalized ``_metadata.file_path``,
      ``_metadata.row_index``); the delete frame is the small side of a
      shuffle/broadcast join, never collected;
    * equality deletes — parquet rows carrying the equality columns —
      anti-join by the delete file's own column names.

    Scope (documented, not silent): deletes apply to ALL data files of
    the snapshot (exact for the overwhelmingly common commit order where
    a delete targets pre-existing data; per-file sequence-number scoping
    — a data file added AFTER an equality delete in the same snapshot
    lineage — is not modeled). The file-path collect is planning-plane
    work, the same listing any engine's planner materializes.
    """
    import json
    import os

    with open(metadata_json_path) as f:
        doc = json.load(f)
    snaps = sorted(doc.get("snapshots", []), key=lambda s: int(s["timestamp-ms"]))
    if not snaps:
        raise ValueError(f"no snapshots in {metadata_json_path}")
    if (snapshot_id is not None) and (as_of_ms is not None):
        raise ValueError("pass at most one of snapshot_id / as_of_ms")
    if snapshot_id is not None:
        matching = [s for s in snaps if int(s["snapshot-id"]) == snapshot_id]
        if not matching:
            raise ValueError(f"snapshot {snapshot_id} not in {metadata_json_path}")
        chosen = matching[0]
    elif as_of_ms is not None:
        before = [s for s in snaps if int(s["timestamp-ms"]) <= as_of_ms]
        if not before:
            raise ValueError(f"no snapshot at or before {as_of_ms}")
        chosen = before[-1]
    else:
        chosen = snaps[-1]

    mlist = chosen["manifest-list"]
    if not os.path.isabs(mlist.removeprefix("file:")):
        mlist = os.path.join(os.path.dirname(metadata_json_path), mlist)
    mlist = mlist.removeprefix("file:")

    def live_paths(content: int) -> list[str]:
        files = files_from_manifest_list(spark, "t", mlist, content=content)
        return [
            r.file_path.removeprefix("file:")
            for r in files.select("file_path").collect()
        ]

    paths = live_paths(0)
    if not paths:
        raise ValueError(f"snapshot {chosen['snapshot-id']} has no live data files")
    data = spark.read.parquet(*paths)

    from ..metadata.metadata_json import _strip_scheme

    pos_delete_paths = live_paths(1)
    eq_delete_paths = live_paths(2)
    if pos_delete_paths:
        data = data.select(
            "*",
            _strip_scheme(F.col("_metadata.file_path")).alias("_fp"),
            F.col("_metadata.row_index").alias("_pos"),
        )
        dels = (
            spark.read.parquet(*pos_delete_paths)
            .select(
                _strip_scheme(F.col("file_path")).alias("_fp"),
                F.col("pos").cast("long").alias("_pos"),
            )
        )
        data = data.join(dels, ["_fp", "_pos"], "left_anti").drop("_fp", "_pos")
    for p in eq_delete_paths:
        eq = spark.read.parquet(p)
        keys = [c for c in eq.columns if c in data.columns]
        if keys:
            data = data.join(eq.select(keys).distinct(), keys, "left_anti")
    return data
