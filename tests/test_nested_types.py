"""Nested types (list/map/struct) end to end: spec-conformant schema
JSON on commit (element/key/value/struct-field ids, last-column-id
accounting — https://iceberg.apache.org/spec/#schemas), reads on BOTH
planes (the JVM plane natively, the Python DataSource via recursive
DDL↔Arrow conversion), DataSource writes, and update_schema adds. The
embeddings table's ``array<float>`` vector column is the motivating
shape — a 100 TB training-data lake is full of nested columns."""

from __future__ import annotations

import json

import pytest

import hielo_spark.metadata as M
from hielo_spark.metadata import commit as C
from hielo_spark.metadata.manifests import read_data_at_snapshot
from hielo_spark.metadata.types import (
    iceberg_to_ddl,
    max_field_id,
    split_top,
    sql_to_iceberg,
)


@pytest.fixture()
def registered(spark):
    from hielo_spark.sources import register

    register(spark)
    return spark


# -- converters ---------------------------------------------------------------


def test_sql_to_iceberg_nested_ids_and_roundtrip():
    nid = [10]

    def alloc():
        nid[0] += 1
        return nid[0]

    t = sql_to_iceberg("array<float>", alloc)
    assert t == {"type": "list", "element-id": 11, "element": "float",
                 "element-required": False}
    m = sql_to_iceberg("map<string,array<int>>", alloc)
    assert m["key-id"] == 12 and m["value-id"] == 13
    assert m["value"]["element-id"] == 14
    s = sql_to_iceberg("struct<a:int,b:struct<c:string>>", alloc)
    assert [f["id"] for f in s["fields"]] == [15, 16]
    assert s["fields"][1]["type"]["fields"][0]["id"] == 17
    assert max_field_id(s) == 17

    # DDL round-trips through the Iceberg JSON form
    for ddl in ("array<float>", "map<string,array<int>>",
                "struct<a:int,b:struct<c:string>>",
                "array<struct<x:double,y:double>>"):
        back = iceberg_to_ddl(sql_to_iceberg(ddl, alloc))
        assert back == ddl

    assert split_top("a:int,b:map<int,int>,c:string") == [
        "a:int", "b:map<int,int>", "c:string"]


# -- JVM plane ----------------------------------------------------------------


def test_append_records_spec_nested_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.sql("""
        SELECT 1 AS id,
               array(0.1F, 0.2F) AS vec,
               named_struct('a', 7, 'b', 'x') AS s,
               map('k', 3) AS props
    """)
    C.append(spark, t, df, snapshot_id=101, timestamp_ms=1700000000000)
    doc = json.load(open(C.current_metadata_path(t)))
    fields = {f["name"]: f for f in doc["schemas"][0]["fields"]}
    assert [fields[n]["id"] for n in ("id", "vec", "s", "props")] == [1, 2, 3, 4]
    assert fields["vec"]["type"]["type"] == "list"
    assert fields["vec"]["type"]["element"] == "float"
    assert fields["s"]["type"]["type"] == "struct"
    assert [g["name"] for g in fields["s"]["type"]["fields"]] == ["a", "b"]
    assert fields["props"]["type"]["type"] == "map"
    # nested ids are unique, above the top-level ids, and tracked
    ids = set()
    for f in fields.values():
        ids.add(f["id"])
        top = max_field_id(f["type"], f["id"])
        assert top not in ids or top == f["id"]
        ids.add(top)
    assert doc["last-column-id"] == max(
        max_field_id(f["type"], f["id"]) for f in fields.values()
    )

    got = read_data_at_snapshot(spark, C.current_metadata_path(t)).collect()
    assert got[0].vec == [pytest.approx(0.1), pytest.approx(0.2)]
    assert got[0].s.a == 7 and got[0].props["k"] == 3


def test_nested_schema_feeds_j2_matrix(spark, tmp_path):
    from hielo_spark.metadata.metadata_json import schemas_from_metadata_json

    t = str(tmp_path / "t")
    df = spark.sql("SELECT 1 AS id, named_struct('a', 7) AS s")
    C.append(spark, t, df, snapshot_id=101, timestamp_ms=1700000000000)
    sdf = schemas_from_metadata_json(spark, [("t", C.current_metadata_path(t))])
    rows = {r.name: r for r in sdf.collect()}
    # struct children appear as their own rows with parent linkage
    assert "a" in rows and rows["a"].parent_field_id == rows["s"].field_id


# -- DataSource plane ---------------------------------------------------------


def test_datasource_reads_nested_columns(registered, spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.sql("""
        SELECT id,
               array(CAST(id AS FLOAT), 2.0F) AS vec,
               named_struct('a', id, 'b', CAST(id AS STRING)) AS s
        FROM range(5)
    """)
    C.append(spark, t, df, snapshot_id=101, timestamp_ms=1700000000000)
    ds = spark.read.format("hielo_iceberg").load(t)
    assert dict(ds.dtypes)["vec"] == "array<float>"
    assert dict(ds.dtypes)["s"] == "struct<a:bigint,b:string>"
    got = sorted((r.id, tuple(r.vec), r.s.a, r.s.b) for r in ds.collect())
    want = sorted(
        (r.id, tuple(r.vec), r.s.a, r.s.b)
        for r in read_data_at_snapshot(
            spark, C.current_metadata_path(t)
        ).collect()
    )
    assert got == want
    assert got[3][1][0] == pytest.approx(3.0)


def test_datasource_writes_nested_columns(registered, spark, tmp_path):
    """Write → read round-trip with nested columns through the Python
    writer: the recorded schema must be spec JSON, not a stringified
    SQL rendering."""
    t = str(tmp_path / "t")
    spark.sql("""
        SELECT id, array(CAST(id AS DOUBLE)) AS vec,
               named_struct('x', id) AS s
        FROM range(3)
    """).coalesce(1).write.format("hielo_iceberg").mode("append") \
        .option("snapshot-id", "101").option("timestamp-ms", "1700000000000") \
        .save(t)
    doc = json.load(open(C.current_metadata_path(t)))
    fields = {f["name"]: f for f in doc["schemas"][0]["fields"]}
    assert fields["vec"]["type"]["type"] == "list"
    assert fields["s"]["type"]["type"] == "struct"
    ds = spark.read.format("hielo_iceberg").load(t)
    assert sorted((r.id, r.vec[0], r.s.x) for r in ds.collect()) == [
        (0, 0.0, 0), (1, 1.0, 1), (2, 2.0, 2)]
    jvm = read_data_at_snapshot(spark, C.current_metadata_path(t))
    assert sorted((r.id, r.vec[0], r.s.x) for r in jvm.collect()) == [
        (0, 0.0, 0), (1, 1.0, 1), (2, 2.0, 2)]


def test_embeddings_table_roundtrip(registered, spark, sf_dir, tmp_path):
    """The real embeddings fixture (array<float> vectors) flows through
    commit + both read planes."""
    from hielo_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    t = str(tmp_path / "t")
    C.append(spark, t, emb, snapshot_id=101, timestamp_ms=1700000000000)
    jvm = read_data_at_snapshot(spark, C.current_metadata_path(t))
    ds = spark.read.format("hielo_iceberg").load(t)
    assert jvm.count() == ds.count() == 50
    j = {r.vec_id: tuple(r.embedding) for r in jvm.collect()}
    d = {r.vec_id: tuple(r.embedding) for r in ds.collect()}
    assert j == d


def test_update_schema_add_nested_column(registered, spark, tmp_path):
    t = str(tmp_path / "t")
    C.append(spark, t,
             spark.createDataFrame([(1, "a")], "id int, v string"),
             snapshot_id=101, timestamp_ms=1700000000000)
    M.update_schema(t, add=[("tags", "array<string>")],
                    timestamp_ms=1700100000000)
    doc = json.load(open(C.current_metadata_path(t)))
    cur = next(s for s in doc["schemas"]
               if s["schema-id"] == doc["current-schema-id"])
    tags = next(f for f in cur["fields"] if f["name"] == "tags")
    assert tags["type"]["type"] == "list"
    assert tags["id"] == 3 and tags["type"]["element-id"] == 4
    assert doc["last-column-id"] == 4

    # both planes surface the added column as nulls on old files
    jvm = read_data_at_snapshot(spark, C.current_metadata_path(t))
    assert jvm.columns == ["id", "v", "tags"]
    assert jvm.collect()[0].tags is None
    ds = spark.read.format("hielo_iceberg").load(t)
    assert ds.columns == ["id", "v", "tags"]
    assert ds.collect()[0].tags is None

    # and a post-evolution append with real values reads back
    C.append(spark, t, spark.createDataFrame(
        [(2, "b", ["x", "y"])], "id int, v string, tags array<string>"),
        snapshot_id=102, timestamp_ms=1700200000000)
    ds2 = spark.read.format("hielo_iceberg").load(t)
    got = {r.id: (list(r.tags) if r.tags is not None else None)
           for r in ds2.collect()}
    assert got == {1: None, 2: ["x", "y"]}
