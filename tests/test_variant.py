"""Iceberg v3 ``variant`` type (metadata/variant.py): the published
Parquet Variant binary encoding decoded to canonical JSON strings on
both read planes. The writer never produces variant — the fixtures
simulate a foreign v3 writer (encode_variant + a metadata.json type
swap), which is exactly the artifact shape the read path must meet."""

from __future__ import annotations

import datetime
import decimal
import json
import os

import pytest

from hielo_spark.metadata import commit as C
from hielo_spark.metadata.variant import (
    decode_variant,
    encode_variant,
    variant_to_json,
)


def test_codec_roundtrip_primitives_and_nesting():
    cases = [
        None, True, False, 0, 42, -7, 2**20, 2**40, 3.14,
        "hi", "x" * 100, b"\x00\x01",
        datetime.date(2024, 3, 5),
        datetime.datetime(2024, 3, 5, 10, 30,
                          tzinfo=datetime.timezone.utc),
        datetime.datetime(2024, 3, 5, 10, 30),
        decimal.Decimal("12.34"),
        {"a": 1, "b": [1, 2, {"c": "deep", "a": None}], "s": "str"},
        list(range(300)),          # large array: 4-byte count path
        {f"k{i}": i for i in range(10)},
        [], {},
    ]
    for c in cases:
        assert decode_variant(*encode_variant(c)) == c, c


def test_codec_four_byte_offsets():
    # >255 bytes of dictionary + values forces the wide offset forms
    big = {f"key_{i:03d}" * 3: "v" * 40 for i in range(30)}
    assert decode_variant(*encode_variant(big)) == big


def test_json_rendering():
    got = variant_to_json(*encode_variant(
        {"a": [1, None, "x"], "d": datetime.date(2024, 1, 2)}
    ))
    assert json.loads(got) == {"a": [1, None, "x"], "d": "2024-01-02"}
    assert variant_to_json(None, None) is None


def test_unknown_primitive_id_raises_loudly():
    meta, _val = encode_variant("x")
    with pytest.raises(ValueError, match="type id 20"):
        decode_variant(meta, bytes([20 << 2]))


def _variant_table(spark, tmp_path, rows):
    """A v3 table whose column ``v`` is variant — built by appending
    the parquet shape (struct<metadata,value> binary) and swapping the
    recorded schema type to "variant", the foreign-writer simulation."""
    import pyarrow as pa
    import pandas as pd

    t = str(tmp_path / "t")
    encoded = [encode_variant(r) for r in rows]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": list(range(len(rows))),
                "v_meta": [m for m, _ in encoded],
                "v_val": [v for _, v in encoded],
            }
        )
    ).selectExpr(
        "CAST(id AS BIGINT) AS id",
        "named_struct('metadata', v_meta, 'value', v_val) AS v",
    )
    C.append(spark, t, df, snapshot_id=101,
             timestamp_ms=1700000000000)
    from hielo_spark.metadata import upgrade_format_version

    upgrade_format_version(t, 3)
    mpath = C.current_metadata_path(t)
    doc = json.load(open(mpath))
    for s in doc["schemas"]:
        for f in s["fields"]:
            if f["name"] == "v":
                f["type"] = "variant"
    json.dump(doc, open(mpath, "w"))
    return t


def test_both_planes_decode_variant_column(spark, tmp_path):
    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.sources import register

    register(spark)
    rows = [
        {"a": 1, "b": [True, None, "s"]},
        "plain string",
        None,
        [1, 2.5, {"deep": {"x": 9}}],
    ]
    t = _variant_table(spark, tmp_path, rows)
    want = {
        0: {"a": 1, "b": [True, None, "s"]},
        1: "plain string",
        2: None,
        3: [1, 2.5, {"deep": {"x": 9}}],
    }

    def check(got):
        assert {
            r.id: (json.loads(r.v) if r.v is not None else None)
            for r in got
        } == want

    check(read_data_at_snapshot(
        spark, C.current_metadata_path(t)).collect())
    check(spark.read.format("hielo_iceberg").load(t).collect())


def test_variant_survives_mor_delete_and_projection(spark, tmp_path):
    """Variant decode composes with the rest of the read path: a v3
    DV delete drops a row, and a projection excluding the variant
    column still scans without decoding it."""
    from hielo_spark.sources import register

    register(spark)
    t = _variant_table(
        spark, tmp_path, [{"k": i} for i in range(6)]
    )
    C.delete_where(spark, t, "id >= 4",
                   snapshot_id=102, timestamp_ms=1700100000000)
    got = spark.read.format("hielo_iceberg").load(t).collect()
    assert {r.id: json.loads(r.v)["k"] for r in got} == {
        i: i for i in range(4)
    }
    only_ids = (
        spark.read.format("hielo_iceberg")
        .option("columns", "id").load(t).collect()
    )
    assert sorted(r.id for r in only_ids) == [0, 1, 2, 3]


def test_shredded_reconstruction_unit():
    """Parquet VariantShredding reconstruction: shredded primitives,
    object groups with an unshredded remainder, array element groups,
    absent fields, and the plain unshredded fallback."""
    from hielo_spark.metadata.variant import (
        _encode_value,
        encode_metadata,
        shredded_row_to_json,
    )

    md = encode_metadata(["a", "b"])
    kid = {"a": 0, "b": 1}
    # object: a shredded (int), b rides the binary remainder
    row = {"metadata": md,
           "value": _encode_value({"b": "str"}, kid),
           "typed_value": {"a": {"value": None, "typed_value": 7}}}
    assert json.loads(shredded_row_to_json(row)) == {"a": 7, "b": "str"}
    # absent field: both null in its group
    row2 = {"metadata": md, "value": None,
            "typed_value": {"a": {"value": None, "typed_value": None},
                            "b": {"value": None, "typed_value": 1}}}
    assert json.loads(shredded_row_to_json(row2)) == {"b": 1}
    # array of element groups, mixed shredded/binary elements
    md0 = encode_metadata([])
    row3 = {"metadata": md0, "value": None,
            "typed_value": [
                {"value": None, "typed_value": 1},
                {"value": _encode_value("x", {}), "typed_value": None},
            ]}
    assert json.loads(shredded_row_to_json(row3)) == [1, "x"]
    # shredded primitive / unshredded fallback / all-null
    assert shredded_row_to_json(
        {"metadata": md0, "value": None, "typed_value": 42}) == "42"
    m, v = encode_variant({"z": [1, 2]})
    assert json.loads(shredded_row_to_json(
        {"metadata": m, "value": v, "typed_value": None})) \
        == {"z": [1, 2]}
    assert shredded_row_to_json(
        {"metadata": md0, "value": None, "typed_value": None}) is None
    assert shredded_row_to_json(None) is None


def _shredded_table(spark, tmp_path):
    """A v3 table whose variant column ``v`` is SHREDDED: object field
    ``a`` as a typed int64 subcolumn, remainder in the binary value."""
    import pandas as pd

    from hielo_spark.metadata.variant import (
        _encode_value,
        encode_metadata,
    )

    t = str(tmp_path / "t")
    md = encode_metadata(["a", "b"])
    kid = {"a": 0, "b": 1}
    rows = [
        # (id, remainder-bytes, shredded a)
        (0, _encode_value({"b": "x"}, kid), 10),
        (1, None, 20),          # fully shredded object {a: 20}
        (2, _encode_value({"b": "y"}, kid), None),  # a absent
    ]
    df = spark.createDataFrame(
        pd.DataFrame({
            "id": [r[0] for r in rows],
            "m": [md] * len(rows),
            "rem": [r[1] for r in rows],
            "a": pd.array([r[2] for r in rows], dtype="Int64"),
        })
    ).selectExpr(
        "CAST(id AS BIGINT) AS id",
        "named_struct('metadata', m, 'value', rem, 'typed_value', "
        "named_struct('a', named_struct('value', "
        "CAST(NULL AS BINARY), 'typed_value', a))) AS v",
    )
    C.append(spark, t, df, snapshot_id=101,
             timestamp_ms=1700000000000)
    from hielo_spark.metadata import upgrade_format_version

    upgrade_format_version(t, 3)
    mpath = C.current_metadata_path(t)
    doc = json.load(open(mpath))
    for s in doc["schemas"]:
        for f in s["fields"]:
            if f["name"] == "v":
                f["type"] = "variant"
    json.dump(doc, open(mpath, "w"))
    return t


def test_both_planes_decode_shredded_variant(spark, tmp_path):
    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.sources import register

    register(spark)
    t = _shredded_table(spark, tmp_path)
    want = {0: {"a": 10, "b": "x"}, 1: {"a": 20}, 2: {"b": "y"}}

    ds = {
        r.id: json.loads(r.v)
        for r in spark.read.format("hielo_iceberg").load(t).collect()
    }
    assert ds == want
    jvm = {
        r.id: json.loads(r.v)
        for r in read_data_at_snapshot(
            spark, C.current_metadata_path(t)).collect()
    }
    assert jvm == want


def test_shredded_variant_evolved_schema_both_planes(spark, tmp_path):
    """The explicit-schema (evolved) JVM path negotiates each file's
    variant shape from its parquet footer, so shredded files
    reconstruct instead of refusing (r9's loud guard) or silently
    nulling typed_value. Both planes agree on values, and the added
    column reads null for pre-evolution files."""
    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.sources import register

    register(spark)
    t = _shredded_table(spark, tmp_path)
    C.update_schema(t, add=[("note", "string")],
                    timestamp_ms=1700100000000)
    want = {0: {"a": 10, "b": "x"}, 1: {"a": 20}, 2: {"b": "y"}}
    jvm = read_data_at_snapshot(spark, C.current_metadata_path(t))
    assert "note" in jvm.columns
    got = {r.id: json.loads(r.v) for r in jvm.collect()}
    assert got == want
    ds = {
        r.id: json.loads(r.v)
        for r in spark.read.format("hielo_iceberg").load(t).collect()
    }
    assert ds == want


def test_mixed_shredded_unshredded_evolved_schema(spark, tmp_path):
    """Evolved-schema matrix: one file SHREDDED, a later file plain
    (metadata, value) — the footer negotiation groups them by shape
    and both reconstruct to the same JSON plane after the union."""
    import pandas as pd

    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.metadata.variant import encode_variant
    from hielo_spark.sources import register

    register(spark)
    t = _shredded_table(spark, tmp_path)
    # second append: UNSHREDDED rows in the plain parquet shape
    m3, v3 = encode_variant({"a": 30, "c": True})
    m4, v4 = encode_variant([1, "two"])
    df2 = spark.createDataFrame(
        pd.DataFrame({
            "id": [3, 4],
            "m": [m3, m4],
            "val": [v3, v4],
        })
    ).selectExpr(
        "CAST(id AS BIGINT) AS id",
        "named_struct('metadata', m, 'value', val) AS v",
    )
    C.append(spark, t, df2, snapshot_id=102,
             timestamp_ms=1700050000000)
    C.update_schema(t, add=[("note", "string")],
                    timestamp_ms=1700100000000)
    want = {
        0: {"a": 10, "b": "x"}, 1: {"a": 20}, 2: {"b": "y"},
        3: {"a": 30, "c": True}, 4: [1, "two"],
    }
    jvm = {
        r.id: json.loads(r.v)
        for r in read_data_at_snapshot(
            spark, C.current_metadata_path(t)).collect()
    }
    assert jvm == want
    ds = {
        r.id: json.loads(r.v)
        for r in spark.read.format("hielo_iceberg").load(t).collect()
    }
    assert ds == want


def test_encoder_metadata_name_sorted_with_bit():
    """The fixture encoder simulates a CONFORMANT foreign writer:
    metadata dictionary sorted by name with the sorted_strings header
    bit set, and object field ids (assigned from the sorted dict) in
    name order — what a name-binary-searching spec reader relies on."""
    from hielo_spark.metadata.variant import (
        decode_metadata,
        decode_variant,
        encode_variant,
    )

    m, v = encode_variant({"zeta": 1, "alpha": {"mid": 2}, "beta": 3})
    assert m[0] & 0x10, "sorted_strings bit not set"
    keys = decode_metadata(m)
    assert keys == sorted(keys) == ["alpha", "beta", "mid", "zeta"]
    assert decode_variant(m, v) == {
        "zeta": 1, "alpha": {"mid": 2}, "beta": 3}
    # object items were emitted in id order == name order: re-encode of
    # a permuted dict yields byte-identical value (order-insensitive)
    m2, v2 = encode_variant({"beta": 3, "alpha": {"mid": 2}, "zeta": 1})
    assert (m2, v2) == (m, v)


def test_shredded_evolved_schema_composes_with_deletes(spark, tmp_path):
    """The shape-negotiated evolved read composes with the rest of the
    plane: schema evolution (added column) + a position delete over a
    table with BOTH shredded and plain variant files — groups scan
    under their own shapes, deletes apply across groups, both planes
    agree."""
    import pandas as pd

    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.metadata.variant import encode_variant
    from hielo_spark.sources import register

    register(spark)
    t = _shredded_table(spark, tmp_path)  # ids 0-2, shredded
    m3, v3 = encode_variant({"a": 30})
    df2 = spark.createDataFrame(
        pd.DataFrame({"id": [3], "m": [m3], "val": [v3]})
    ).selectExpr(
        "CAST(id AS BIGINT) AS id",
        "named_struct('metadata', m, 'value', val) AS v",
    )
    C.append(spark, t, df2, snapshot_id=102,
             timestamp_ms=1700050000000)
    C.update_schema(t, add=[("note", "string")],
                    timestamp_ms=1700100000000)
    # one deleted row in the SHREDDED file, one in the plain file
    C.delete_where(spark, t, "id IN (1, 3)",
                   snapshot_id=103, timestamp_ms=1700200000000)
    want = {0: {"a": 10, "b": "x"}, 2: {"b": "y"}}
    jvm = {
        r.id: json.loads(r.v)
        for r in read_data_at_snapshot(
            spark, C.current_metadata_path(t)).collect()
    }
    assert jvm == want
    ds = {
        r.id: json.loads(r.v)
        for r in spark.read.format("hielo_iceberg").load(t).collect()
    }
    assert ds == want


def test_codec_roundtrip_hypothesis():
    """Property fuzz over arbitrary JSON-shaped values: encode→decode
    is the identity (ints exact across the 1/2/4/8-byte forms, nested
    objects/arrays at any mix, name-sorted dictionaries)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = (
        st.none() | st.booleans()
        | st.integers(min_value=-(2**62), max_value=2**62)
        | st.floats(allow_nan=False, allow_infinity=False)
        | st.text(max_size=24)
    )
    values = st.recursive(
        scalars,
        lambda c: st.lists(c, max_size=5)
        | st.dictionaries(st.text(min_size=1, max_size=8), c, max_size=5),
        max_leaves=25,
    )

    @settings(max_examples=150, deadline=None)
    @given(values)
    def check(v):
        assert decode_variant(*encode_variant(v)) == v

    check()


def test_variant_write_path_both_planes(spark, tmp_path):
    """r10: the WRITE half of v3 variant — append(variant_cols=[...])
    encodes JSON strings to the spec's (metadata, value) pair, records
    the column as ``variant``, commits new tables at format-version 3,
    and both read planes surface canonical JSON. Composes with a
    second append and a DV delete."""
    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.sources import register

    register(spark)
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(0, '{"b": 1, "a": [true, null, "s"]}'),
         (1, '"plain"'),
         (2, None),
         (3, '{"nested": {"deep": [1, 2.5]}}')],
        "id long, v string")
    C.append(spark, t, df, snapshot_id=101,
             timestamp_ms=1700000000000, variant_cols=["v"])
    doc = json.loads(
        open(C.current_metadata_path(t)).read())
    assert int(doc["format-version"]) == 3
    assert [f["type"] for f in doc["schemas"][0]["fields"]
            if f["name"] == "v"] == ["variant"]
    want = {0: {"a": [True, None, "s"], "b": 1}, 1: "plain",
            2: None, 3: {"nested": {"deep": [1, 2.5]}}}

    def decode(rows):
        return {r.id: (json.loads(r.v) if r.v is not None else None)
                for r in rows}

    assert decode(read_data_at_snapshot(
        spark, C.current_metadata_path(t)).collect()) == want
    assert decode(
        spark.read.format("hielo_iceberg").load(t).collect()) == want

    # a later append + DV delete compose
    C.append(spark, t,
             spark.createDataFrame([(4, '{"x": 9}')], "id long, v string"),
             snapshot_id=102, timestamp_ms=1700100000000,
             variant_cols=["v"])
    C.delete_where(spark, t, "id = 1",
                   snapshot_id=103, timestamp_ms=1700200000000)
    got = decode(spark.read.format("hielo_iceberg").load(t).collect())
    assert got == {0: want[0], 2: None, 3: want[3], 4: {"x": 9}}


def test_variant_write_refusals(spark, tmp_path):
    """Guard rails: v2 tables refuse variant appends (upgrade first);
    a column recorded as non-variant refuses (silent corruption
    otherwise); non-string/non-struct frames refuse."""
    from hielo_spark.metadata import upgrade_format_version

    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(3).selectExpr("id", "'x' AS v"),
             snapshot_id=101, timestamp_ms=1700000000000)
    with pytest.raises(ValueError, match="format-version"):
        C.append(spark, t,
                 spark.createDataFrame([(9, '{"k":1}')],
                                       "id long, v string"),
                 snapshot_id=102, timestamp_ms=1700100000000,
                 variant_cols=["v"])
    upgrade_format_version(t, 3)
    with pytest.raises(ValueError, match="recorded as"):
        C.append(spark, t,
                 spark.createDataFrame([(9, '{"k":1}')],
                                       "id long, v string"),
                 snapshot_id=102, timestamp_ms=1700100000000,
                 variant_cols=["v"])
    t2 = str(tmp_path / "t2")
    with pytest.raises(ValueError, match="JSON string"):
        C.append(spark, t2, spark.range(3).selectExpr("id", "id AS v"),
                 snapshot_id=101, timestamp_ms=1700000000000,
                 variant_cols=["v"])


def test_variant_column_added_by_schema_evolution(spark, tmp_path):
    """update_schema can ADD a variant column to a v3 table; files
    written before the add read null, later variant appends decode on
    both planes (the evolved-schema shape negotiation handles the
    missing-column group)."""
    from hielo_spark.metadata import upgrade_format_version
    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.sources import register

    register(spark)
    t = str(tmp_path / "t")
    C.append(spark, t, spark.range(3).selectExpr("id"),
             snapshot_id=101, timestamp_ms=1700000000000)
    upgrade_format_version(t, 3)
    C.update_schema(t, add=[("v", "variant")],
                    timestamp_ms=1700050000000)
    C.append(spark, t,
             spark.createDataFrame([(3, '{"k": 1}')], "id long, v string"),
             snapshot_id=102, timestamp_ms=1700100000000,
             variant_cols=["v"])
    want = {0: None, 1: None, 2: None, 3: {"k": 1}}

    def decode(rows):
        return {r.id: (json.loads(r.v) if r.v is not None else None)
                for r in rows}

    assert decode(read_data_at_snapshot(
        spark, C.current_metadata_path(t)).collect()) == want
    assert decode(
        spark.read.format("hielo_iceberg").load(t).collect()) == want


def test_variant_shredded_write_roundtrip(spark, tmp_path):
    """r10: the SHREDDING writer (VariantShredding.md) —
    append(variant_shred={"v": {"a": "bigint"}}) lands type-matching
    fields as typed subcolumns, mismatches and extra fields in the
    binary remainder, JSON null as a present variant-null (never
    absent), scalars unshredded. Both planes reconstruct, including
    after schema evolution (the engine now reads its OWN shredded
    files through the r10 evolved-path shape negotiation)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.sources import register

    register(spark)
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(0, '{"a": 7, "b": "x"}'),          # a shreds typed
         (1, '{"a": "not-int", "b": "y"}'),  # mismatch → group binary
         (2, '{"b": "z"}'),                  # a absent
         (3, '{"a": null}'),                 # JSON null stays present
         (4, '"scalar"'),                    # non-object
         (5, None)],
        "id long, v string")
    C.append(spark, t, df, snapshot_id=101,
             timestamp_ms=1700000000000,
             variant_cols=["v"], variant_shred={"v": {"a": "bigint"}})
    f = sorted(_glob.glob(t + "/data/**/*.parquet", recursive=True))[0]
    vt = pq.read_schema(f).field("v").type
    assert [vt.field(i).name for i in range(vt.num_fields)] == [
        "metadata", "value", "typed_value"]
    want = {0: {"a": 7, "b": "x"}, 1: {"a": "not-int", "b": "y"},
            2: {"b": "z"}, 3: {"a": None}, 4: "scalar", 5: None}

    def decode(rows):
        return {r.id: (json.loads(r.v) if r.v is not None else None)
                for r in rows}

    assert decode(read_data_at_snapshot(
        spark, C.current_metadata_path(t)).collect()) == want
    assert decode(
        spark.read.format("hielo_iceberg").load(t).collect()) == want

    # evolved schema: our own shredded files ride the r10 footer-driven
    # shape negotiation
    C.update_schema(t, add=[("note", "string")],
                    timestamp_ms=1700100000000)
    evolved = read_data_at_snapshot(spark, C.current_metadata_path(t))
    assert "note" in evolved.columns
    assert decode(evolved.collect()) == want

    # unsupported shred target types refuse
    with pytest.raises(ValueError, match="unsupported shred"):
        C.append(spark, str(tmp_path / "t2"), df,
                 snapshot_id=101, timestamp_ms=1700000000000,
                 variant_cols=["v"],
                 variant_shred={"v": {"a": "decimal(4,2)"}})


def test_array_shredded_variant_both_planes(spark, tmp_path):
    """Array-of-element-groups shredding (VariantShredding.md's array
    form — a foreign writer may shred list elements): typed elements,
    binary-remainder elements, and whole-row fallbacks reconstruct on
    both planes. Complements the object-group fixture."""
    import pandas as pd

    from hielo_spark.metadata.manifests import read_data_at_snapshot
    from hielo_spark.metadata.variant import (
        _encode_value,
        encode_metadata,
    )
    from hielo_spark.sources import register

    register(spark)
    t = str(tmp_path / "t")
    md0 = encode_metadata([])
    rows = [
        # (id, remainder, [(elem_value_bytes, elem_typed)])
        (0, None, [(None, 1), (None, 2)]),                 # all typed
        (1, None, [(_encode_value("x", {}), None), (None, 9)]),  # mixed
        (2, _encode_value("whole", {}), None),             # unshredded
    ]
    df = spark.createDataFrame(
        pd.DataFrame({
            "id": [r[0] for r in rows],
            "m": [md0] * len(rows),
            "rem": [r[1] for r in rows],
            "elems": [r[2] for r in rows],
        })
    ).selectExpr(
        "CAST(id AS BIGINT) AS id",
        "named_struct('metadata', m, 'value', rem, 'typed_value', "
        "transform(elems, e -> named_struct("
        "'value', e._1, 'typed_value', CAST(e._2 AS BIGINT)))) AS v",
    )
    C.append(spark, t, df, snapshot_id=101,
             timestamp_ms=1700000000000)
    from hielo_spark.metadata import upgrade_format_version

    upgrade_format_version(t, 3)
    mpath = C.current_metadata_path(t)
    doc = json.load(open(mpath))
    for s in doc["schemas"]:
        for f in s["fields"]:
            if f["name"] == "v":
                f["type"] = "variant"
    json.dump(doc, open(mpath, "w"))

    want = {0: [1, 2], 1: ["x", 9], 2: "whole"}

    def decode(rows_):
        return {r.id: json.loads(r.v) for r in rows_}

    assert decode(read_data_at_snapshot(spark, mpath).collect()) == want
    assert decode(
        spark.read.format("hielo_iceberg").load(t).collect()) == want
