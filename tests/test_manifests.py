"""Iceberg manifest-plane readers (metadata/manifests.py): real Avro
container files — written with the same Apache Avro JVM library Spark
ships (the codec under test is Apache's, not ours; our code under test
is the Iceberg-schema interpretation and frame construction) — parsed
back into the canonical frames, through to the file-size histogram.

Long-typed Avro fields get values > 2^31 so py4j converts the Python
ints to java.lang.Long (small ints arrive as Integer and Avro's
GenericDatumWriter refuses them for long fields)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from hielo_spark.metadata.manifests import (
    files_from_manifest_list,
    read_manifest,
    read_manifest_list,
)

MANIFEST_LIST_V2 = """
{"type":"record","name":"manifest_file","fields":[
 {"name":"manifest_path","type":"string"},
 {"name":"manifest_length","type":"long"},
 {"name":"partition_spec_id","type":"int"},
 {"name":"added_snapshot_id","type":"long"},
 {"name":"added_files_count","type":"int"},
 {"name":"existing_files_count","type":"int"},
 {"name":"deleted_files_count","type":"int"}]}
"""

MANIFEST_LIST_V1 = """
{"type":"record","name":"manifest_file","fields":[
 {"name":"manifest_path","type":"string"},
 {"name":"manifest_length","type":"long"},
 {"name":"partition_spec_id","type":"int"},
 {"name":"added_snapshot_id","type":"long"},
 {"name":"added_data_files_count","type":"int"},
 {"name":"existing_data_files_count","type":"int"},
 {"name":"deleted_data_files_count","type":"int"}]}
"""

MANIFEST_ENTRY = """
{"type":"record","name":"manifest_entry","fields":[
 {"name":"status","type":"int"},
 {"name":"snapshot_id","type":["null","long"],"default":null},
 {"name":"data_file","type":{"type":"record","name":"data_file_r","fields":[
   {"name":"file_path","type":"string"},
   {"name":"file_format","type":"string"},
   {"name":"record_count","type":"long"},
   {"name":"file_size_in_bytes","type":"long"}]}}]}
"""

SNAP = 3_000_000_001  # > 2^31: forces java.lang.Long through py4j
MB = 1048576


def _avro_json(field_schema, v):
    """Python value → Avro-JSON-encoding shape for the field: unions wrap
    non-null values as {"type": value}, records recurse by field."""
    t = field_schema.getType().getName()
    if t == "union":
        if v is None:
            return None
        member = next(
            s for s in field_schema.getTypes() if s.getType().getName() != "null"
        )
        return {member.getType().getName(): _avro_json(member, v)}
    if t == "record":
        return {
            f.name(): _avro_json(f.schema(), v.get(f.name()))
            for f in field_schema.getFields()
        }
    return v


def _write_avro(spark, path: str, schema_json: str, rows: list[dict]) -> None:
    """Write real Avro container files with Spark's own Apache Avro JVM
    library. Rows go through Avro's JSON decoder JVM-side rather than
    GenericData.Record.put via py4j — py4j boxes small Python ints as
    Integer (and auto-unboxes any java.lang.Long we create back to int),
    which Avro refuses for long fields; the JSON route types every value
    from the schema."""
    import json as _json

    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    dfw.create(schema, jvm.java.io.File(path))
    for row in rows:
        payload = _json.dumps(
            {f.name(): _avro_json(f.schema(), row.get(f.name())) for f in schema.getFields()}
        )
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(schema, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()


def _entry(status: int, path: str, size_bytes: int, records: int) -> dict:
    return {
        "status": status,
        "snapshot_id": SNAP,
        "data_file": {
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": SNAP + records,
            "file_size_in_bytes": size_bytes,
        },
    }


def test_manifest_roundtrip_and_histogram(spark, tmp_path):
    from hielo_spark.metadata.files import file_size_histogram

    m1 = str(tmp_path / "m1.avro")
    m2 = str(tmp_path / "m2.avro")
    # bucket edges are in MB; file_size_in_bytes must be > 2^31 for py4j →
    # use the large(>512MB) and huge sizes plus one deleted entry
    _write_avro(
        spark,
        m1,
        MANIFEST_ENTRY,
        [
            _entry(1, "s3://w/data/a.parquet", 3 * 1024 * MB, 10),  # 3 GiB large
            _entry(0, "s3://w/data/b.parquet", 5 * 1024 * MB, 20),  # 5 GiB large
            _entry(2, "s3://w/data/gone.parquet", 4 * 1024 * MB, 5),  # deleted
        ],
    )
    _write_avro(
        spark,
        m2,
        MANIFEST_ENTRY,
        [_entry(1, "s3://w/data/c.parquet", 2 * 1024 * MB + 7, 30)],
    )
    mlist = str(tmp_path / "snap-1.avro")
    _write_avro(
        spark,
        mlist,
        MANIFEST_LIST_V2,
        [
            {"manifest_path": f"file:{m1}", "manifest_length": SNAP, "partition_spec_id": 0,
             "added_snapshot_id": SNAP, "added_files_count": 2, "existing_files_count": 0,
             "deleted_files_count": 1},
            {"manifest_path": m2, "manifest_length": SNAP, "partition_spec_id": 0,
             "added_snapshot_id": SNAP, "added_files_count": 1, "existing_files_count": 0,
             "deleted_files_count": 0},
        ],
    )

    lst = read_manifest_list(spark, mlist)
    assert [r.manifest_path for r in lst.collect()] == [f"file:{m1}", m2]
    assert [r.added_files_count for r in lst.collect()] == [2, 1]

    entries = read_manifest(spark, m1)
    assert entries.count() == 3
    assert entries.filter(F.col("status") == 2).count() == 1

    files = files_from_manifest_list(spark, "real_t", mlist)
    got = {r.file_path: r.file_size_in_bytes for r in files.collect()}
    # the deleted entry is excluded; live files from both manifests present
    assert got == {
        "s3://w/data/a.parquet": 3 * 1024 * MB,
        "s3://w/data/b.parquet": 5 * 1024 * MB,
        "s3://w/data/c.parquet": 2 * 1024 * MB + 7,
    }
    hist = {
        (r.table_name, r.bucket): (r.n_files, r.pct_files)
        for r in file_size_histogram(files).collect()
    }
    assert hist == {("real_t", "large(>512MB)"): (3, 100.0)}


def test_manifest_list_v1_field_aliases(spark, tmp_path):
    p = str(tmp_path / "snap-v1.avro")
    _write_avro(
        spark,
        p,
        MANIFEST_LIST_V1,
        [{"manifest_path": "m.avro", "manifest_length": SNAP, "partition_spec_id": 1,
          "added_snapshot_id": SNAP, "added_data_files_count": 7,
          "existing_data_files_count": 3, "deleted_data_files_count": 0}],
    )
    r = read_manifest_list(spark, p).collect()[0]
    assert (r.added_files_count, r.existing_files_count, r.deleted_files_count) == (7, 3, 0)
    assert r.partition_spec_id == 1


def test_read_data_at_snapshot_time_travel(spark, tmp_path):
    """Two snapshots over real parquet data files: VERSION-AS-OF by id,
    TIMESTAMP-AS-OF by instant, and latest-by-default all read exactly
    the files live in that snapshot."""
    import json

    from hielo_spark.metadata.manifests import read_data_at_snapshot

    d1 = str(tmp_path / "d1.parquet")
    d2 = str(tmp_path / "d2.parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).coalesce(1).write.parquet(d1)
    spark.createDataFrame([(3, "c")], ["id", "v"]).coalesce(1).write.parquet(d2)

    def manifest_for(name, *parts):
        p = str(tmp_path / f"{name}.avro")
        _write_avro(spark, p, MANIFEST_ENTRY, [_entry(1, part, 3 * 1024 * 1048576, 1) for part in parts])
        return p

    def mlist_for(name, manifest):
        p = str(tmp_path / f"{name}.avro")
        _write_avro(spark, p, MANIFEST_LIST_V2, [
            {"manifest_path": manifest, "manifest_length": SNAP, "partition_spec_id": 0,
             "added_snapshot_id": SNAP, "added_files_count": 1,
             "existing_files_count": 0, "deleted_files_count": 0}])
        return p

    ml1 = mlist_for("list-1", manifest_for("man-1", d1))
    ml2 = mlist_for("list-2", manifest_for("man-2", d1, d2))
    meta = {
        "format-version": 2,
        "snapshots": [
            {"snapshot-id": 10, "timestamp-ms": 1700000000000, "schema-id": 0,
             "manifest-list": ml1, "summary": {"operation": "append"}},
            {"snapshot-id": 11, "timestamp-ms": 1700100000000, "schema-id": 0,
             "manifest-list": ml2, "summary": {"operation": "append"}},
        ],
    }
    mpath = str(tmp_path / "v3.metadata.json")
    with open(mpath, "w") as f:
        json.dump(meta, f)

    at_10 = {r.id for r in read_data_at_snapshot(spark, mpath, snapshot_id=10).collect()}
    at_11 = {r.id for r in read_data_at_snapshot(spark, mpath, snapshot_id=11).collect()}
    latest = {r.id for r in read_data_at_snapshot(spark, mpath).collect()}
    as_of = {r.id for r in read_data_at_snapshot(spark, mpath, as_of_ms=1700050000000).collect()}
    assert at_10 == {1, 2}
    assert at_11 == latest == {1, 2, 3}
    assert as_of == {1, 2}  # between the two commits → the earlier snapshot


def _mini_warehouse(spark, tmp_path):
    """Two snapshots + one orphan: s1 = {d_old, d1}, s2 = {d1, d2};
    d_orphan exists on disk but is referenced by neither."""
    import json

    import glob as globmod

    data = tmp_path / "data"
    paths = {}
    for name, rows in (
        ("d_old", [(0, "z")]), ("d1", [(1, "a"), (2, "b")]),
        ("d2", [(3, "c")]), ("d_orphan", [(9, "x")]),
    ):
        p = str(data / f"{name}.parquet")
        spark.createDataFrame(rows, ["id", "v"]).coalesce(1).write.parquet(p)
        # manifests reference individual data FILES (as Iceberg does),
        # not the directory Spark's writer wraps them in
        paths[name] = globmod.glob(f"{p}/part-*.parquet")[0]

    def mk_snapshot(name, *files):
        man = str(tmp_path / f"man-{name}.avro")
        _write_avro(spark, man, MANIFEST_ENTRY,
                    [_entry(1, paths[f], 3 * 1024 * MB, 1) for f in files])
        ml = str(tmp_path / f"list-{name}.avro")
        _write_avro(spark, ml, MANIFEST_LIST_V2, [
            {"manifest_path": man, "manifest_length": SNAP, "partition_spec_id": 0,
             "added_snapshot_id": SNAP, "added_files_count": len(files),
             "existing_files_count": 0, "deleted_files_count": 0}])
        return ml

    meta = {
        "format-version": 2,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1700000000000, "schema-id": 0,
             "manifest-list": mk_snapshot("s1", "d_old", "d1"),
             "summary": {"operation": "append"}},
            {"snapshot-id": 2, "timestamp-ms": 1700100000000, "schema-id": 0,
             "manifest-list": mk_snapshot("s2", "d1", "d2"),
             "summary": {"operation": "append"}},
        ],
    }
    mpath = str(tmp_path / "w.metadata.json")
    with open(mpath, "w") as f:
        json.dump(meta, f)
    return str(data), mpath, paths


@pytest.mark.slow
def test_orphan_file_detection(spark, tmp_path):
    from hielo_spark.ops.analysis import orphan_files

    data_dir, mpath, paths = _mini_warehouse(spark, tmp_path)
    orphans = orphan_files(spark, data_dir, mpath)
    got = [r.path for r in orphans.collect()]
    assert len(got) == 1 and "d_orphan" in got[0]


@pytest.mark.slow
def test_expire_snapshots_plan(spark, tmp_path):
    from hielo_spark.ops.analysis import expire_snapshots_plan

    data_dir, mpath, paths = _mini_warehouse(spark, tmp_path)
    # expire everything older than a cutoff between the two commits,
    # retaining the newest snapshot: s1 expires; d_old (only in s1) is
    # removable, d1 is NOT (still live in s2)
    expired, removable = expire_snapshots_plan(
        spark, mpath, older_than_ms=1700050000000, retain_last=1
    )
    assert [r.snapshot_id for r in expired.collect()] == [1]
    rem = [r.file_path for r in removable.collect()]
    assert len(rem) == 1 and "d_old" in rem[0]
    # retention floor wins: retain_last=2 expires nothing
    expired2, removable2 = expire_snapshots_plan(
        spark, mpath, older_than_ms=1700050000000, retain_last=2
    )
    assert expired2.count() == 0 and removable2.count() == 0


def test_warehouse_discovery_and_health(spark, tmp_path):
    """Hadoop-catalog mode end-to-end: two tables laid out as
    <warehouse>/<ns>/<table>/metadata/v<N>.metadata.json, discovered by
    distributed listing (latest version wins), browsed via the catalog
    tree, and fed to the health suite as one snapshots frame."""
    import json

    from hielo_spark.catalog.browse import search
    from hielo_spark.catalog.warehouse import (
        catalog_tree_from_warehouse,
        discover_tables,
        snapshots_for_warehouse,
    )
    from hielo_spark.metadata import snapshots as snap

    wh = tmp_path / "warehouse"
    for ns, tbl, n_versions, n_snaps in (
        ("analytics", "orders_t", 2, 2),
        ("raw", "events_t", 1, 1),
    ):
        mdir = wh / ns / tbl / "metadata"
        mdir.mkdir(parents=True)
        for v in range(1, n_versions + 1):
            doc = {
                "format-version": 2,
                "snapshots": [
                    {"snapshot-id": i + 1, "timestamp-ms": 1700000000000 + i * 1000,
                     "schema-id": 0, "manifest-list": f"snap-{i+1}.avro",
                     "summary": {"operation": "append", "added-records": str(10 * v)}}
                    # older metadata versions carry fewer snapshots
                    for i in range(n_snaps if v == n_versions else n_snaps - 1)
                ],
            }
            with open(mdir / f"v{v}.metadata.json", "w") as f:
                json.dump(doc, f)

    disc = {r.full_name: (r.version, r.metadata_json_path) for r in discover_tables(spark, str(wh)).collect()}
    assert set(disc) == {"analytics.orders_t", "raw.events_t"}
    assert disc["analytics.orders_t"][0] == 2  # latest version won
    assert "v2.metadata.json" in disc["analytics.orders_t"][1]

    tree = catalog_tree_from_warehouse(spark, "wh", str(wh))
    hit = search(tree, "orders").collect()
    assert len(hit) == 1 and hit[0].full_name == "wh.analytics.orders_t"

    snaps = snapshots_for_warehouse(spark, str(wh))
    # orders_t contributes its v2 snapshot count (2), events_t one
    counts = {r.table_name: r.n for r in
              snaps.groupBy("table_name").agg(F.count("*").alias("n")).collect()}
    assert counts == {"analytics.orders_t": 2, "raw.events_t": 1}
    latest = {r.table_name: r.snapshot_id for r in snap.latest_snapshot(snaps).collect()}
    assert latest == {"analytics.orders_t": 2, "raw.events_t": 1}


MANIFEST_LIST_V2_CONTENT = """
{"type":"record","name":"manifest_file","fields":[
 {"name":"manifest_path","type":"string"},
 {"name":"manifest_length","type":"long"},
 {"name":"partition_spec_id","type":"int"},
 {"name":"content","type":"int"},
 {"name":"added_snapshot_id","type":"long"},
 {"name":"added_files_count","type":"int"},
 {"name":"existing_files_count","type":"int"},
 {"name":"deleted_files_count","type":"int"}]}
"""

MANIFEST_ENTRY_CONTENT = """
{"type":"record","name":"manifest_entry","fields":[
 {"name":"status","type":"int"},
 {"name":"snapshot_id","type":["null","long"],"default":null},
 {"name":"data_file","type":{"type":"record","name":"data_file_c","fields":[
   {"name":"content","type":"int"},
   {"name":"file_path","type":"string"},
   {"name":"file_format","type":"string"},
   {"name":"record_count","type":"long"},
   {"name":"file_size_in_bytes","type":"long"}]}}]}
"""


def test_mor_position_and_equality_deletes(spark, tmp_path):
    """v2 merge-on-read: a data file plus a position-delete file (kills
    row 1 of d1) and an equality-delete file (kills id=3 wherever it is)
    must both apply on read."""
    import glob as globmod
    import json

    from hielo_spark.metadata.manifests import read_data_at_snapshot

    def write_one(name, df):
        p = str(tmp_path / name)
        df.coalesce(1).write.parquet(p)
        return globmod.glob(f"{p}/part-*.parquet")[0]

    d1 = write_one("d1.parquet", spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]))
    d2 = write_one("d2.parquet", spark.createDataFrame(
        [(4, "d"), (3, "dup-c")], ["id", "v"]))
    # position delete: (file_path, pos) — kill d1 row index 1 (id=2)
    pos_del = write_one("pd.parquet", spark.createDataFrame(
        [(f"file:{d1}", 1)], ["file_path", "pos"]))
    # equality delete on id — kills id=3 in BOTH files
    eq_del = write_one("ed.parquet", spark.createDataFrame([(3,)], ["id"]))

    def entry(content, path):
        return {"status": 1, "snapshot_id": SNAP,
                "data_file": {"content": content, "file_path": path,
                              "file_format": "PARQUET",
                              "record_count": SNAP, "file_size_in_bytes": SNAP}}

    def manifest(name, content, *paths):
        p = str(tmp_path / f"{name}.avro")
        _write_avro(spark, p, MANIFEST_ENTRY_CONTENT,
                    [entry(content, pth) for pth in paths])
        return p

    data_man = manifest("man-data", 0, d1, d2)
    pos_man = manifest("man-pos", 1, pos_del)
    eq_man = manifest("man-eq", 2, eq_del)
    ml = str(tmp_path / "list.avro")
    _write_avro(spark, ml, MANIFEST_LIST_V2_CONTENT, [
        {"manifest_path": data_man, "manifest_length": SNAP, "partition_spec_id": 0,
         "content": 0, "added_snapshot_id": SNAP, "added_files_count": 2,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": pos_man, "manifest_length": SNAP, "partition_spec_id": 0,
         "content": 1, "added_snapshot_id": SNAP, "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": eq_man, "manifest_length": SNAP, "partition_spec_id": 0,
         "content": 1, "added_snapshot_id": SNAP, "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0},
    ])
    meta = {"format-version": 2, "snapshots": [
        {"snapshot-id": 1, "timestamp-ms": 1700000000000, "schema-id": 0,
         "manifest-list": ml, "summary": {"operation": "overwrite"}}]}
    mpath = str(tmp_path / "mor.metadata.json")
    with open(mpath, "w") as f:
        json.dump(meta, f)

    got = {(r.id, r.v) for r in read_data_at_snapshot(spark, mpath).collect()}
    # id=2 gone (position delete), id=3 gone from BOTH files (equality),
    # id=1 and id=4 survive
    assert got == {(1, "a"), (4, "d")}


def test_warehouse_discovery_uuid_naming(spark, tmp_path):
    """REST-materialized tables name metadata files <seq>-<uuid>.metadata.json;
    the leading sequence number must rank versions just like vN naming."""
    import json

    from hielo_spark.catalog.warehouse import discover_tables

    mdir = tmp_path / "wh" / "ns" / "t" / "metadata"
    mdir.mkdir(parents=True)
    for name in (
        "00001-9aaf8d78-0000-4000-8000-000000000001.metadata.json",
        "00003-9aaf8d78-0000-4000-8000-000000000003.metadata.json",
        "00002-9aaf8d78-0000-4000-8000-000000000002.metadata.json",
    ):
        with open(mdir / name, "w") as f:
            json.dump({"format-version": 2, "snapshots": []}, f)
    r = discover_tables(spark, str(tmp_path / "wh")).collect()[0]
    assert r.version == 3 and "00003-" in r.metadata_json_path


MANIFEST_LIST_V2_SEQ = """
{"type":"record","name":"manifest_file","fields":[
 {"name":"manifest_path","type":"string"},
 {"name":"manifest_length","type":"long"},
 {"name":"partition_spec_id","type":"int"},
 {"name":"content","type":"int"},
 {"name":"sequence_number","type":"long"},
 {"name":"added_snapshot_id","type":"long"},
 {"name":"added_files_count","type":"int"},
 {"name":"existing_files_count","type":"int"},
 {"name":"deleted_files_count","type":"int"}]}
"""

MANIFEST_ENTRY_SEQ = """
{"type":"record","name":"manifest_entry","fields":[
 {"name":"status","type":"int"},
 {"name":"snapshot_id","type":["null","long"],"default":null},
 {"name":"sequence_number","type":["null","long"],"default":null},
 {"name":"data_file","type":{"type":"record","name":"data_file_s","fields":[
   {"name":"content","type":"int"},
   {"name":"file_path","type":"string"},
   {"name":"file_format","type":"string"},
   {"name":"record_count","type":"long"},
   {"name":"file_size_in_bytes","type":"long"}]}}]}
"""


def test_mor_sequence_number_scoping(spark, tmp_path):
    """Iceberg v2 scan-planning rules (ADVICE r3 medium): an equality
    delete applies only to data files with data sequence number strictly
    BELOW the delete's — a row re-inserted after the delete, in the same
    lineage, must survive time travel. Also covers manifest-list seq
    inheritance (entries with null seq) and position-delete >= scoping.

    Lineage (one current snapshot, three commits merged into its
    manifest list, as Iceberg writes it):
      seq 1: d1 adds ids {1, 2, 3}
      seq 2: equality delete on id=3  (kills seq-1 copies only)
      seq 3: d2 re-inserts id=3 plus id=4
      seq 3: position delete kills d1 row 1 (id=2) — pos deletes use >=
    Expected live rows: {1 (d1), 3 (d2 re-insert), 4 (d2)}.
    """
    import glob as globmod
    import json

    from hielo_spark.metadata.manifests import read_data_at_snapshot

    def write_one(name, df):
        p = str(tmp_path / name)
        df.coalesce(1).write.parquet(p)
        return globmod.glob(f"{p}/part-*.parquet")[0]

    d1 = write_one("d1.parquet", spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]))
    d2 = write_one("d2.parquet", spark.createDataFrame(
        [(3, "c-reinserted"), (4, "d")], ["id", "v"]))
    eq_del = write_one("ed.parquet", spark.createDataFrame([(3,)], ["id"]))
    pos_del = write_one("pd.parquet", spark.createDataFrame(
        [(f"file:{d1}", 1)], ["file_path", "pos"]))

    def entry(content, path, seq=None):
        e = {"status": 1, "snapshot_id": SNAP,
             "data_file": {"content": content, "file_path": path,
                           "file_format": "PARQUET",
                           "record_count": SNAP, "file_size_in_bytes": SNAP}}
        if seq is not None:
            e["sequence_number"] = seq
        return e

    def manifest(name, entries):
        p = str(tmp_path / f"{name}.avro")
        _write_avro(spark, p, MANIFEST_ENTRY_SEQ, entries)
        return p

    # d1's entry has an EXPLICIT seq; d2's entry has null seq and must
    # inherit seq 3 from its manifest-list row
    man_d1 = manifest("man-d1", [entry(0, d1, seq=1)])
    man_d2 = manifest("man-d2", [entry(0, d2)])
    man_eq = manifest("man-eq", [entry(2, eq_del, seq=2)])
    man_pos = manifest("man-pos", [entry(1, pos_del, seq=3)])

    def mrow(man, content, seq, n):
        return {"manifest_path": man, "manifest_length": SNAP,
                "partition_spec_id": 0, "content": content,
                "sequence_number": seq, "added_snapshot_id": SNAP,
                "added_files_count": n, "existing_files_count": 0,
                "deleted_files_count": 0}

    ml = str(tmp_path / "list.avro")
    _write_avro(spark, ml, MANIFEST_LIST_V2_SEQ, [
        mrow(man_d1, 0, 1, 1),
        mrow(man_d2, 0, 3, 1),
        mrow(man_eq, 1, 2, 1),
        mrow(man_pos, 1, 3, 1),
    ])
    meta = {"format-version": 2, "snapshots": [
        {"snapshot-id": 1, "timestamp-ms": 1700000000000, "schema-id": 0,
         "manifest-list": ml, "summary": {"operation": "overwrite"}}]}
    mpath = str(tmp_path / "seq.metadata.json")
    with open(mpath, "w") as f:
        json.dump(meta, f)

    got = {(r.id, r.v) for r in read_data_at_snapshot(spark, mpath).collect()}
    assert got == {(1, "a"), (3, "c-reinserted"), (4, "d")}


def test_warehouse_discovery_depth_and_multilevel_ns(spark, tmp_path):
    """ADVICE r3: discovery must count only files in the canonical
    <wh>/<ns...>/<table>/metadata/ layout — a metadata.json at another
    depth must not fabricate a table from fixed path offsets — and a
    multi-level namespace joins with '.' for display."""
    import json

    from hielo_spark.catalog.warehouse import discover_tables

    wh = tmp_path / "wh"

    def doc(relpath):
        p = wh / relpath
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "w") as f:
            json.dump({"format-version": 2, "snapshots": []}, f)

    doc("ns/t/metadata/v1.metadata.json")                # canonical
    doc("raw/logs/events_t/metadata/v2.metadata.json")   # 2-level ns
    doc("ns/stray.metadata.json")                        # ns level: ignore
    doc("ns/t/data/part-0/deep.metadata.json")           # data dir: ignore
    doc("top.metadata.json")                             # root: ignore

    rows = {(r.namespace, r.table_name, r.version)
            for r in discover_tables(spark, str(wh)).collect()}
    assert rows == {("ns", "t", 1), ("raw.logs", "events_t", 2)}


def test_vshape_probe_threads_knob(monkeypatch):
    """r11: the footer shape-probe pool size is a knob
    (HIELO_VSHAPE_PROBE_THREADS) — the planning-latency lever for
    many-thousand-file snapshots on object stores; clamped, junk-safe."""
    from hielo_spark.metadata.manifests import _vshape_probe_threads

    monkeypatch.delenv("HIELO_VSHAPE_PROBE_THREADS", raising=False)
    assert _vshape_probe_threads() == 16
    monkeypatch.setenv("HIELO_VSHAPE_PROBE_THREADS", "2")
    assert _vshape_probe_threads() == 2
    monkeypatch.setenv("HIELO_VSHAPE_PROBE_THREADS", "0")
    assert _vshape_probe_threads() == 1
    monkeypatch.setenv("HIELO_VSHAPE_PROBE_THREADS", "9999")
    assert _vshape_probe_threads() == 256
    monkeypatch.setenv("HIELO_VSHAPE_PROBE_THREADS", "junk")
    assert _vshape_probe_threads() == 16
