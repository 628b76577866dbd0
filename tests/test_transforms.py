"""Iceberg partition transforms (metadata/transforms.py): spec parsing,
spec-exact murmur3 bucket vectors, literal→partition-value mapping, and
hidden-partitioning commits (write-side derivation + metadata-only
pruning + source columns untouched in data)."""

from __future__ import annotations

import datetime
import os

import pytest

from hielo_spark.metadata import commit as C
from hielo_spark.metadata.manifests import (
    files_from_manifest_list,
    read_data_at_snapshot,
)
from hielo_spark.metadata.transforms import (
    PartitionTransform,
    murmur3_32_bytes,
    murmur3_32_long,
    parse_partition_by,
)


def test_murmur3_spec_vectors():
    """The published Iceberg spec appendix-B bucket hash vectors."""
    assert int(murmur3_32_long([34])[0]) == 2017239379
    assert murmur3_32_bytes("iceberg".encode()) == 1210000089
    days = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert int(murmur3_32_long([days])[0]) == -653330422
    micros = int(
        datetime.datetime(
            2017, 11, 16, 22, 31, 8, tzinfo=datetime.timezone.utc
        ).timestamp()
        * 1_000_000
    )
    assert int(murmur3_32_long([micros])[0]) == -2047944441


def test_parse_specs_and_fields():
    ts = parse_partition_by(["region", "days(ts)", "bucket(8, id)", "truncate(4, s)"])
    assert [(t.kind, t.field) for t in ts] == [
        ("identity", "region"),
        ("days", "ts_day"),
        ("bucket", "id_bucket"),
        ("truncate", "s_truncate"),
    ]
    with pytest.raises(ValueError, match="unsupported partition transform"):
        parse_partition_by(["median(ts)"])
    with pytest.raises(ValueError, match="positive"):
        parse_partition_by(["bucket(0, id)"])
    with pytest.raises(ValueError, match="duplicate"):
        parse_partition_by(["days(ts)", "days(ts)"])


def test_value_of_maps_literals_to_partitions():
    d = PartitionTransform("days(ts)")
    assert d.value_of("2024-03-05T10:30:00") == "2024-03-05"
    m = PartitionTransform("months(ts)")
    assert m.value_of(datetime.datetime(2024, 3, 5, 10)) == "2024-03"
    t = PartitionTransform("truncate(3, s)")
    assert t.value_of("alphabet") == "alp"
    ti = PartitionTransform("truncate(10, v)")
    assert ti.value_of(-7) == -10  # floors toward -inf, per the spec
    b = PartitionTransform("bucket(16, id)")
    assert b.value_of(34) == 2017239379 % 16
    bs = PartitionTransform("bucket(16, s)")
    assert bs.value_of("iceberg") == 1210000089 % 16


def test_hidden_partition_commit_roundtrip_and_pruning(spark, tmp_path):
    t = str(tmp_path / "wh" / "ns" / "t")
    df = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 10:00:00"),
            (2, "b", "2024-01-01 23:59:59"),
            (3, "c", "2024-01-02 00:00:01"),
            (4, "d", "2024-01-03 12:00:00"),
        ],
        ["id", "v", "ts_s"],
    ).selectExpr("id", "v", "CAST(ts_s AS TIMESTAMP_NTZ) AS ts")
    snap = C.append(spark, t, df, partition_by=["days(ts)", "bucket(4, id)"],
                    snapshot_id=101, timestamp_ms=1700000000000)
    mpath = C.current_metadata_path(t)

    # schema identical to the source frame: no partition columns leak in
    back = read_data_at_snapshot(spark, mpath)
    assert set(back.columns) == {"id", "v", "ts"}
    assert {r.id for r in back.collect()} == {1, 2, 3, 4}

    # manifest records the derived values
    files = files_from_manifest_list(
        spark, "t", snap["manifest-list"].removeprefix("file:")
    ).collect()
    daysets = {f.partition_values["ts_day"] for f in files}
    assert daysets == {"2024-01-01", "2024-01-02", "2024-01-03"}
    assert all("id_bucket" in f.partition_values for f in files)

    # metadata-only day pruning
    day2 = read_data_at_snapshot(
        spark, mpath, partition_filter={"ts_day": "2024-01-02"}
    )
    assert {r.id for r in day2.collect()} == {3}

    # bucket pruning via the literal→value mapping (hidden partitioning:
    # the caller reasons about id, the engine derives the bucket)
    b = PartitionTransform("bucket(4, id)")
    want = read_data_at_snapshot(
        spark, mpath, partition_filter={"id_bucket": str(b.value_of(4))}
    )
    assert 4 in {r.id for r in want.collect()}


def test_hidden_partition_mixed_identity_and_deletes(spark, tmp_path):
    t = str(tmp_path / "wh" / "ns" / "t")
    df = spark.createDataFrame(
        [(1, "us", "x"), (2, "us", "y"), (3, "eu", "z")],
        ["id", "region", "v"],
    )
    C.append(spark, t, df, partition_by=["region", "bucket(2, id)"],
             snapshot_id=101, timestamp_ms=1700000000000)
    mpath = C.current_metadata_path(t)
    back = read_data_at_snapshot(spark, mpath)
    # identity partition is reattached, hidden bucket is not
    assert set(back.columns) == {"id", "region", "v"}
    assert {(r.id, r.region) for r in back.collect()} == {
        (1, "us"), (2, "us"), (3, "eu"),
    }
    us = read_data_at_snapshot(spark, mpath, partition_filter={"region": "us"})
    assert {r.id for r in us.collect()} == {1, 2}

    # MOR equality delete composes with hidden partitioning
    C.delete_equality(spark, t, spark.createDataFrame([(2,)], ["id"]),
                      snapshot_id=102, timestamp_ms=1700100000000)
    mpath = C.current_metadata_path(t)
    assert {r.id for r in read_data_at_snapshot(spark, mpath).collect()} == {1, 3}


def test_bucket_distribution_is_spec_stable(spark):
    """The Spark-side bucket expression equals the scalar spec math for
    every value — including magnitudes past 2^53 (the float64 cliff the
    old Arrow path fell off) and NULLs."""
    import pyspark.sql.functions as F

    t = PartitionTransform("bucket(8, id)")
    df = spark.range(-500, 500).select(F.col("id").cast("bigint").alias("id"))
    got = {r.id: r.b for r in df.select("id", t.expr("bigint").alias("b")).collect()}
    for v in (-500, -1, 0, 1, 34, 499):
        assert got[v] == t.value_of(v), v

    big = [
        (9007199254740993,),          # 2^53 + 1: float64 would round it
        (9007199254740992,),
        (-9007199254740993,),
        (2**62 + 12345,),
        (None,),
    ]
    bdf = spark.createDataFrame(big, "id bigint")
    gb = {r.id: r.b for r in bdf.select("id", t.expr("bigint").alias("b")).collect()}
    for (v,) in big:
        if v is None:
            assert gb[None] is None
        else:
            assert gb[v] == t.value_of(v), v
    # adjacent giants land in different buckets (proves no rounding
    # collapsed them)
    assert int(murmur3_32_long([9007199254740993])[0]) != int(
        murmur3_32_long([9007199254740992])[0])


def test_committed_tables_feed_the_schema_and_spec_planes(spark, tmp_path):
    """First append records Iceberg schemas/partition-specs in the
    metadata document; the J1/J2 read plane then treats our own tables
    like any Iceberg table's."""
    import json

    from hielo_spark.metadata.metadata_json import (
        partition_spec_rows_from_doc,
        schemas_from_metadata_json,
    )
    from hielo_spark.metadata.schemas import partition_source_join

    t = str(tmp_path / "wh" / "ns" / "t")
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:00:00")], ["id", "v", "ts_s"]
    ).selectExpr("id", "v", "CAST(ts_s AS TIMESTAMP_NTZ) AS ts")
    C.append(spark, t, df, partition_by=["days(ts)", "bucket(4, id)"],
             snapshot_id=101, timestamp_ms=1700000000000)
    mpath = C.current_metadata_path(t)
    doc = json.loads(open(mpath).read())

    assert [f["name"] for f in doc["schemas"][0]["fields"]] == ["id", "v", "ts"]
    assert [f["type"] for f in doc["schemas"][0]["fields"]] == [
        "long", "string", "timestamp"]
    spec_rows = partition_spec_rows_from_doc("t", doc)
    assert spec_rows == [
        ("t", 0, 1000, 3, "ts_day", "day"),
        ("t", 0, 1001, 1, "id_bucket", "bucket[4]"),
    ]

    # J1 end-to-end: source-id resolves to the source column name
    schemas_long = schemas_from_metadata_json(spark, [("t", mpath)])
    specs = spark.createDataFrame(
        spec_rows,
        "table_name string, spec_id int, field_id int, source_id int, "
        "name string, transform string",
    )
    joined = {
        r.name: (r.source_field, r.transform)
        for r in partition_source_join(specs, schemas_long).collect()
    }
    assert joined == {
        "ts_day": ("ts", "day"),
        "id_bucket": ("id", "bucket[4]"),
    }

    # a second append must not rewrite the recorded shape
    C.append(spark, t, df, snapshot_id=102, timestamp_ms=1700100000000)
    doc2 = json.loads(open(C.current_metadata_path(t)).read())
    assert doc2["schemas"] == doc["schemas"]
    assert doc2["partition-specs"] == doc["partition-specs"]


@pytest.mark.slow
def test_merge_into_honors_recorded_partition_spec(spark, tmp_path):
    """MERGE writes its data files in the table's recorded partition
    layout (manifest partition values included), so pruning never
    degrades as a table takes merges."""
    from hielo_spark.metadata.commit import merge_into

    t = str(tmp_path / "wh" / "ns" / "t")
    df = spark.createDataFrame(
        [(1, "us", "a"), (2, "eu", "b")], ["id", "region", "v"]
    )
    C.append(spark, t, df, partition_by=["region", "bucket(2, id)"],
             snapshot_id=101, timestamp_ms=1700000000000)
    snap = merge_into(
        spark, t,
        spark.createDataFrame([(2, "eu", "B"), (3, "us", "c")],
                              ["id", "region", "v"]),
        on=["id"], snapshot_id=102, timestamp_ms=1700100000000,
    )
    files = files_from_manifest_list(
        spark, "t", snap["manifest-list"].removeprefix("file:")
    ).collect()
    # every data file (original + merged) carries both partition keys
    assert all(
        f.partition_values and {"region", "id_bucket"} <= set(f.partition_values)
        for f in files
    )
    mpath = C.current_metadata_path(t)
    back = {(r.id, r.region, r.v)
            for r in read_data_at_snapshot(spark, mpath).collect()}
    assert back == {(1, "us", "a"), (2, "eu", "B"), (3, "us", "c")}
    # pruning still metadata-only after the merge
    us = read_data_at_snapshot(spark, mpath, partition_filter={"region": "us"})
    assert {r.id for r in us.collect()} == {1, 3}


def test_partition_evolution(spark, tmp_path):
    """update_partition_spec records a new default spec; later appends
    (no explicit partition_by) write under it, old files keep their old
    values, mixed-spec reads and pruning stay correct."""
    from hielo_spark.metadata.commit import update_partition_spec
    from hielo_spark.metadata.metadata_json import partition_spec_rows_from_doc
    import json

    t = str(tmp_path / "wh" / "ns" / "t")
    df1 = spark.createDataFrame(
        [(1, "us", "2024-01-01 10:00:00"), (2, "eu", "2024-01-02 10:00:00")],
        ["id", "region", "ts_s"],
    ).selectExpr("id", "region", "CAST(ts_s AS TIMESTAMP_NTZ) AS ts")
    C.append(spark, t, df1, partition_by=["region"],
             snapshot_id=101, timestamp_ms=1700000000000)

    new_id = update_partition_spec(t, ["days(ts)"])
    assert new_id == 1

    df2 = spark.createDataFrame(
        [(3, "us", "2024-02-05 09:00:00")], ["id", "region", "ts_s"]
    ).selectExpr("id", "region", "CAST(ts_s AS TIMESTAMP_NTZ) AS ts")
    snap = C.append(spark, t, df2, snapshot_id=102, timestamp_ms=1700100000000)

    files = {os.path.basename(f.file_path): dict(f.partition_values or {})
             for f in files_from_manifest_list(
                 spark, "t", snap["manifest-list"].removeprefix("file:")
             ).collect()}
    assert any("region" in v for v in files.values())        # old spec files
    assert any(v.get("ts_day") == "2024-02-05" for v in files.values())

    mpath = C.current_metadata_path(t)
    back = read_data_at_snapshot(spark, mpath)
    assert {(r.id, r.region) for r in back.collect()} == {
        (1, "us"), (2, "eu"), (3, "us")}

    # pruning: region filter keeps new-spec files (missing key = may
    # match) but drops the eu file; day filter keeps old-spec files
    us = read_data_at_snapshot(spark, mpath, partition_filter={"region": "us"})
    assert {r.id for r in us.collect()} == {1, 3}
    feb = read_data_at_snapshot(spark, mpath, partition_filter={"ts_day": "2024-02-05"})
    assert 3 in {r.id for r in feb.collect()}

    # both specs live in the metadata, J1-readable
    doc = json.load(open(mpath))
    rows = partition_spec_rows_from_doc("t", doc)
    assert ("t", 0, 1000, 2, "region", "identity") in rows
    assert any(r[1] == 1 and r[4] == "ts_day" and r[5] == "day" for r in rows)


def test_value_of_review_fixes():
    """ISO strings aimed at timestamp bucket columns hash as micros
    (with dtype), microsecond literals survive exactly (no float
    rounding), and tz-aware literals normalize to UTC."""
    b = PartitionTransform("bucket(97, ts)")
    iso = "2017-11-16T22:31:08"
    # dtype-aware: the ISO string hashes as epoch micros, equal to the
    # datetime form — and equals the published spec hash's bucket
    want = (-2047944441 & 0x7FFFFFFF) % 97
    assert b.value_of(iso, dtype="timestamp") == want
    assert b.value_of(datetime.datetime(2017, 11, 16, 22, 31, 8)) == want
    # without dtype, a str hashes as a string (documented dispatch)
    assert b.value_of(iso) != want or murmur3_32_bytes(iso.encode()) % 97 == want

    # exact micros: +1µs must change the hashed long by exactly 1
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0, 0)
    t1 = datetime.datetime(2024, 1, 1, 0, 0, 0, 1)
    m0 = (t0 - datetime.datetime(1970, 1, 1)) // datetime.timedelta(microseconds=1)
    assert b.value_of(t1) == (int(murmur3_32_long([m0 + 1])[0]) & 0x7FFFFFFF) % 97

    # tz-aware day literal lands in its UTC day
    d = PartitionTransform("days(ts)")
    est = datetime.timezone(datetime.timedelta(hours=-5))
    assert d.value_of(datetime.datetime(2024, 3, 5, 23, 30, tzinfo=est)) == "2024-03-06"
    # date bucket via ISO string + dtype
    db = PartitionTransform("bucket(16, d)")
    assert db.value_of("2017-11-16", dtype="date") == (-653330422 & 0x7FFFFFFF) % 16


def test_prune_filter_for_and_refs_protected_expiry(spark, tmp_path):
    import json

    from hielo_spark.metadata.transforms import prune_filter_for

    t = str(tmp_path / "wh" / "ns" / "t")
    df = spark.createDataFrame(
        [(1, "us", "2024-01-01 10:00:00"), (2, "eu", "2024-01-02 10:00:00")],
        ["id", "region", "ts_s"],
    ).selectExpr("id", "region", "CAST(ts_s AS TIMESTAMP_NTZ) AS ts")
    C.append(spark, t, df, partition_by=["region", "days(ts)", "bucket(4, id)"],
             snapshot_id=101, timestamp_ms=1700000000000)
    doc = json.load(open(C.current_metadata_path(t)))

    # one call derives every prunable partition field for a predicate
    pf = prune_filter_for(doc, "ts", "2024-01-02T10:00:00")
    assert pf == {"ts_day": "2024-01-02"}
    pf_id = prune_filter_for(doc, "id", 2)
    b = PartitionTransform("bucket(4, id)")
    assert pf_id == {"id_bucket": str(b.value_of(2))}
    assert prune_filter_for(doc, "v_nope", 1) == {}
    got = read_data_at_snapshot(spark, C.current_metadata_path(t),
                                partition_filter=pf)
    assert {r.id for r in got.collect()} == {2}

    # refs protect snapshots from expiry
    C.append(spark, t, df, snapshot_id=102, timestamp_ms=1700100000000)
    C.append(spark, t, df, snapshot_id=103, timestamp_ms=1700200000000)
    C.create_ref(t, "v1", 101, ref_type="tag")
    expired = C.expire_snapshots(t, older_than_ms=1700200000000, retain_last=1)
    assert 101 not in expired  # tagged → survives retention
    assert 102 in expired
    # the tag still time-travels
    rows = read_data_at_snapshot(spark, C.current_metadata_path(t), ref="v1")
    assert rows.count() == 2


def test_read_table_one_call_pruning(spark, tmp_path):
    """read_table derives partition pruning AND bounds skipping from a
    plain (col, op, value) predicate — no spec knowledge needed."""
    from hielo_spark.metadata.manifests import read_table

    t = str(tmp_path / "wh" / "ns" / "t")
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "a"),
            (2, "2024-01-02 10:00:00", "b"),
            (3, "2024-01-03 10:00:00", "c"),
        ],
        ["id", "ts_s", "v"],
    ).selectExpr("id", "CAST(ts_s AS TIMESTAMP_NTZ) AS ts", "v")
    C.append(spark, t, df, partition_by=["days(ts)"],
             snapshot_id=101, timestamp_ms=1700000000000)

    out = read_table(spark, t, where=("ts", "=", "2024-01-02T10:00:00"))
    assert {r.id for r in out.collect()} == {2}
    # range predicate: bounds skipping + row filter, no partition filter
    hi = read_table(spark, t, where=("id", ">", 2))
    assert {r.id for r in hi.collect()} == {3}
    # no predicate: plain current read
    assert read_table(spark, t).count() == 3


def test_value_of_dtype_coercions_truncate_and_date():
    tr = PartitionTransform("truncate(10, id)")
    assert tr.value_of("42", dtype="bigint") == 40   # was "42"[:10]
    assert tr.value_of("abcdefghijkl", dtype="string") == "abcdefghij"
    db = PartitionTransform("bucket(16, d)")
    # datetime literal aimed at a DATE column hashes days, not micros
    want = (-653330422 & 0x7FFFFFFF) % 16
    assert db.value_of(datetime.datetime(2017, 11, 16, 12, 30), dtype="date") == want
