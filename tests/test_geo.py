"""Iceberg v3 ``geometry``/``geography`` (metadata/geo.py): WKB
decoded to WKT strings on both read planes. Fixtures simulate a
foreign v3 writer (WKB binary column + metadata.json type swap)."""

from __future__ import annotations

import json

import pytest

from hielo_spark.metadata import commit as C
from hielo_spark.metadata.geo import encode_wkb, wkb_to_wkt


def test_wkb_canonical_vectors():
    # published NDR vector for POINT (1 2)
    assert wkb_to_wkt(bytes.fromhex(
        "0101000000000000000000F03F0000000000000040")) == "POINT (1 2)"
    # same point, big-endian (XDR)
    assert wkb_to_wkt(bytes.fromhex(
        "00000000013FF00000000000004000000000000000")) == "POINT (1 2)"


def test_wkb_all_geometry_kinds():
    assert wkb_to_wkt(encode_wkb(
        "linestring", [(30, 10), (10, 30), (40, 40)]
    )) == "LINESTRING (30 10, 10 30, 40 40)"
    assert wkb_to_wkt(encode_wkb(
        "polygon",
        [[(30, 10), (40, 40), (20, 40), (10, 20), (30, 10)],
         [(20, 30), (35, 35), (30, 20), (20, 30)]],
    )) == ("POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10), "
           "(20 30, 35 35, 30 20, 20 30))")
    assert wkb_to_wkt(encode_wkb("multipoint", [(10, 40), (40, 30)])) \
        == "MULTIPOINT ((10 40), (40 30))"
    assert wkb_to_wkt(encode_wkb(
        "multipolygon",
        [[[(30, 20), (45, 40), (10, 40), (30, 20)]],
         [[(15, 5), (40, 10), (10, 20), (15, 5)]]],
    )) == ("MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
           "((15 5, 40 10, 10 20, 15 5)))")
    assert wkb_to_wkt(encode_wkb(
        "geometrycollection",
        [("point", (4, 6)), ("linestring", [(4, 6), (7, 10)])],
    )) == "GEOMETRYCOLLECTION (POINT (4 6), LINESTRING (4 6, 7 10))"


def test_wkb_dimensions_srid_and_errors():
    assert wkb_to_wkt(encode_wkb("point", (1, 2, 3), z=True)) \
        == "POINT Z (1 2 3)"
    assert wkb_to_wkt(encode_wkb("point", (1.5, 2.25, 3, 4),
                                 z=True, m=True)) \
        == "POINT ZM (1.5 2.25 3 4)"
    # EWKB SRID flag form: SRID is dropped (CRS rides in the TYPE)
    assert wkb_to_wkt(encode_wkb("point", (1, 2), srid=4326)) \
        == "POINT (1 2)"
    assert wkb_to_wkt(encode_wkb(
        "multipoint", [(1, 2, 3)], z=True
    )) == "MULTIPOINT Z ((1 2 3))"
    assert wkb_to_wkt(None) is None
    with pytest.raises(ValueError, match="type code 99"):
        wkb_to_wkt(b"\x01" + (99).to_bytes(4, "little") + b"\x00" * 16)
    with pytest.raises(ValueError, match="truncated"):
        wkb_to_wkt(b"")


def test_both_planes_decode_geometry_column(spark, tmp_path):
    import pandas as pd

    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.sources import register

    register(spark)
    t = str(tmp_path / "t")
    shapes = [
        encode_wkb("point", (1, 2)),
        encode_wkb("linestring", [(0, 0), (5, 5)]),
        None,
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1, 2], "shape": shapes})
    ).selectExpr("CAST(id AS BIGINT) AS id", "shape")
    C.append(spark, t, df, snapshot_id=101,
             timestamp_ms=1700000000000)
    from hielo_spark.metadata import upgrade_format_version

    upgrade_format_version(t, 3)
    mpath = C.current_metadata_path(t)
    doc = json.load(open(mpath))
    for s in doc["schemas"]:
        for f in s["fields"]:
            if f["name"] == "shape":
                f["type"] = "geometry(OGC:CRS84)"
    json.dump(doc, open(mpath, "w"))

    want = {0: "POINT (1 2)", 1: "LINESTRING (0 0, 5 5)", 2: None}
    jvm = {
        r.id: r.shape
        for r in read_data_at_snapshot(
            spark, C.current_metadata_path(t)).collect()
    }
    ds = {
        r.id: r.shape
        for r in spark.read.format("hielo_iceberg").load(t).collect()
    }
    assert jvm == ds == want


def test_wkt_round_trips_every_rendered_form():
    from hielo_spark.metadata.geo import wkt_to_wkb

    cases = [
        "POINT (1 2)", "POINT Z (1 2 3)", "POINT ZM (1.5 2.25 3 4)",
        "POINT M (1 2 9)", "POINT EMPTY", "LINESTRING EMPTY",
        "LINESTRING (30 10, 10 30, 40 40)",
        "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10), "
        "(20 30, 35 35, 30 20, 20 30))",
        "MULTIPOINT ((10 40), (40 30))", "MULTIPOINT Z ((1 2 3))",
        "MULTILINESTRING ((0 0, 5 5), (1 1, 2 2, 3 3))",
        "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
        "((15 5, 40 10, 10 20, 15 5)))",
        "GEOMETRYCOLLECTION (POINT (4 6), LINESTRING (4 6, 7 10))",
        "GEOMETRYCOLLECTION EMPTY", "MULTIPOINT EMPTY",
        "POINT (1e-05 -2.5)", "POINT (NaN 2)",
    ]
    for c in cases:
        assert wkb_to_wkt(wkt_to_wkb(c)) == c
    # bare multipoint children normalize to the parenthesized form
    assert wkb_to_wkt(wkt_to_wkb("MULTIPOINT (10 40, 40 30)")) \
        == "MULTIPOINT ((10 40), (40 30))"
    # EWKB decode → WKT → ISO WKB normalizes (SRID dropped on decode)
    assert wkb_to_wkt(wkt_to_wkb(wkb_to_wkt(
        encode_wkb("point", (1, 2), srid=4326)))) == "POINT (1 2)"
    assert wkt_to_wkb(None) is None
    for bad in ["POINT 1 2", "FOO (1 2)", "POINT (1 2",
                "POINT (1 2) tail", "POINT (a b)", ""]:
        with pytest.raises(ValueError):
            wkt_to_wkb(bad)


def _mk_geo_table(spark, tmp_path):
    import pandas as pd

    t = str(tmp_path / "tgeo")
    shapes = [
        encode_wkb("point", (1, 2)),
        encode_wkb("linestring", [(0, 0), (5, 5)]),
        None,
        encode_wkb("polygon", [[(0, 0), (4, 0), (4, 4), (0, 0)]]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1, 2, 3], "shape": shapes,
                      "tag": ["a", "b", "c", "d"]})
    ).selectExpr("CAST(id AS BIGINT) AS id", "shape", "tag")
    C.append(spark, t, df, snapshot_id=101, timestamp_ms=1700000000000)
    from hielo_spark.metadata import upgrade_format_version

    upgrade_format_version(t, 3)
    mpath = C.current_metadata_path(t)
    doc = json.load(open(mpath))
    for s in doc["schemas"]:
        for f in s["fields"]:
            if f["name"] == "shape":
                f["type"] = "geometry(OGC:CRS84)"
    json.dump(doc, open(mpath, "w"))
    return t


@pytest.mark.slow
def test_update_where_round_trips_geo_columns(spark, tmp_path):
    """The r12 loud guard lifted: UPDATE on a geo-typed table
    re-encodes the WKT read-back to WKB (geo.wkt_to_wkb) — untouched
    geo values survive byte-semantics-exact on both planes, and a SET
    can assign a WKT literal directly."""
    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.sources import register

    register(spark)
    t = _mk_geo_table(spark, tmp_path)
    C.update_where(spark, t, "id IN (0, 2)",
                   {"tag": "'upd'", "shape": "'POINT Z (7 8 9)'"},
                   snapshot_id=102, timestamp_ms=1700100000000)
    want = {
        0: ("POINT Z (7 8 9)", "upd"),
        1: ("LINESTRING (0 0, 5 5)", "b"),
        2: ("POINT Z (7 8 9)", "upd"),
        3: ("POLYGON ((0 0, 4 0, 4 4, 0 0))", "d"),
    }
    jvm = {r.id: (r.shape, r.tag) for r in read_data_at_snapshot(
        spark, C.current_metadata_path(t)).collect()}
    ds = {r.id: (r.shape, r.tag) for r in
          spark.read.format("hielo_iceberg").load(t).collect()}
    assert jvm == ds == want
    # a second UPDATE touching only a non-geo column still round-trips
    # the (now rewritten) geo values
    C.update_where(spark, t, "id = 1", {"tag": "'late'"},
                   snapshot_id=103, timestamp_ms=1700200000000)
    jvm2 = {r.id: (r.shape, r.tag) for r in read_data_at_snapshot(
        spark, C.current_metadata_path(t)).collect()}
    assert jvm2 == {**want, 1: ("LINESTRING (0 0, 5 5)", "late")}
