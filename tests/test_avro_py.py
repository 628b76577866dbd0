"""Property tests for the pure-Python Avro container codec
(metadata/avro_py.py) and the Appendix D single-value codec
(metadata/values.py) — hypothesis round-trips over the value spaces the
manifest formats actually carry, plus deflate-codec parity and
JVM cross-reads."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hielo_spark.metadata.avro_py import read_avro_file, write_avro_file

_ROW_SCHEMA = json.dumps({
    "type": "record", "name": "r", "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "ob", "type": ["null", "boolean"], "default": None},
        {"name": "m", "type": ["null", {"type": "map", "values": "long"}],
         "default": None},
        {"name": "a", "type": {"type": "array", "items": {
            "type": "record", "name": "kv", "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": "bytes"},
            ]}}},
    ],
})

_row = st.fixed_dictionaries({
    "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
    "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "d": st.floats(allow_nan=False, allow_infinity=False),
    "s": st.text(max_size=40),
    "b": st.binary(max_size=40),
    "ob": st.none() | st.booleans(),
    "m": st.none() | st.dictionaries(st.text(min_size=1, max_size=8),
                                     st.integers(-(2**40), 2**40),
                                     max_size=4),
    "a": st.lists(st.fixed_dictionaries({
        "key": st.integers(0, 10_000),
        "value": st.binary(max_size=16),
    }), max_size=4),
})


@settings(max_examples=30, deadline=None)
@given(rows=st.lists(_row, max_size=8), deflate=st.booleans())
def test_avro_container_roundtrip(tmp_path_factory, rows, deflate):
    p = str(tmp_path_factory.mktemp("avro") / "x.avro")
    write_avro_file(p, _ROW_SCHEMA, rows,
                    codec="deflate" if deflate else "null")
    _, meta, back = read_avro_file(p)
    assert meta["avro.codec"] == (b"deflate" if deflate else b"null")
    assert back == rows


def test_deflate_file_readable_by_jvm(spark, tmp_path):
    """The 'readable by BOTH' guarantee needs an INDEPENDENT reader:
    since r5 read_manifest_list decodes via avro_py itself, this test
    drives Spark's bundled JVM Avro library directly (the same pattern
    as test_spec_conformance)."""
    from hielo_spark.metadata.commit import MANIFEST_LIST_SCHEMA_V2

    p = str(tmp_path / "x.avro")
    rows = [{
        "manifest_path": f"/m{i}.avro", "manifest_length": i,
        "partition_spec_id": 0, "content": 0, "sequence_number": i,
        "min_sequence_number": i, "added_snapshot_id": 100 + i,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": i,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    } for i in range(5)]
    write_avro_file(p, MANIFEST_LIST_SCHEMA_V2, rows, codec="deflate")
    jvm = spark._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader.openReader(
        jvm.java.io.File(p), reader
    )
    got = []
    try:
        assert dfr.getMetaString("avro.codec") == "deflate"
        while dfr.hasNext():
            r = dfr.next()
            got.append((str(r.get("manifest_path")),
                        int(str(r.get("sequence_number")))))
    finally:
        dfr.close()
    assert got == [(f"/m{i}.avro", i) for i in range(5)]


_APPENDIX_D_CASES = [
    ("int", st.integers(-(2**31), 2**31 - 1), str),
    ("long", st.integers(-(2**63), 2**63 - 1), str),
    ("string", st.text(max_size=60), str),
    ("date", st.dates(), lambda d: d.isoformat()),
]


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_appendix_d_roundtrip_property(data):
    from hielo_spark.metadata.values import deserialize_value, serialize_value

    itype, strat, fmt = data.draw(st.sampled_from(_APPENDIX_D_CASES))
    v = fmt(data.draw(strat))
    assert deserialize_value(itype, serialize_value(itype, v)) == v


@settings(max_examples=60, deadline=None)
@given(micros=st.integers(min_value=-(2**52), max_value=2**52))
def test_appendix_d_timestamp_roundtrip_property(micros):
    """Any µs instant (incl. pre-epoch) survives string → bytes →
    string; the bytes are exactly the little-endian micros."""
    import struct

    from hielo_spark.metadata.values import (
        _format_ts, deserialize_value, serialize_value,
    )

    s = _format_ts(micros)
    b = serialize_value("timestamp", s)
    assert struct.unpack("<q", b)[0] == micros
    assert deserialize_value("timestamp", b) == s


@settings(max_examples=40, deadline=None)
@given(
    unscaled=st.integers(min_value=-(10**15), max_value=10**15),
    scale=st.integers(min_value=0, max_value=6),
)
def test_appendix_d_decimal_roundtrip_property(unscaled, scale):
    from hielo_spark.metadata.values import deserialize_value, serialize_value

    t = f"decimal(18,{scale})"
    if scale == 0:
        s = str(unscaled)
    else:
        sign = "-" if unscaled < 0 else ""
        digits = str(abs(unscaled)).rjust(scale + 1, "0")
        s = f"{sign}{digits[:-scale]}.{digits[-scale:]}"
    assert deserialize_value(t, serialize_value(t, s)) == s


def test_multi_block_write_readable_by_both(spark, tmp_path):
    """block_bytes splits large row sets into many container blocks
    (r12 — real Avro writers flush ~64 KB blocks; one giant block made
    the whole manifest the decompression unit). Pin that a tiny
    threshold yields >1 block and that BOTH readers — avro_py and the
    JVM Avro library — decode every row across block boundaries."""

    from hielo_spark.metadata.avro_py import _MAGIC
    from hielo_spark.metadata.commit import MANIFEST_LIST_SCHEMA_V2

    p = str(tmp_path / "mb.avro")
    rows = [{
        "manifest_path": f"/m{i}.avro", "manifest_length": i,
        "partition_spec_id": 0, "content": 0, "sequence_number": i,
        "min_sequence_number": i, "added_snapshot_id": 100 + i,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": i,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    } for i in range(200)]
    write_avro_file(p, MANIFEST_LIST_SCHEMA_V2, rows, codec="deflate",
                    block_bytes=256)
    _, _, back = read_avro_file(p)
    assert [r["manifest_path"] for r in back] == \
        [r["manifest_path"] for r in rows]
    # count blocks: walk the container framing directly
    raw = open(p, "rb").read()
    assert raw[:4] == _MAGIC
    jvm = spark._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader.openReader(
        jvm.java.io.File(p), reader
    )
    got = []
    try:
        while dfr.hasNext():
            got.append(str(dfr.next().get("manifest_path")))
    finally:
        dfr.close()
    assert got == [f"/m{i}.avro" for i in range(200)]
    # python-side framing walk to prove >1 block
    from hielo_spark.metadata.avro_py import _Decoder, _decode_datum

    dec = _Decoder(raw)
    dec.pos = 4
    _decode_datum(dec, {"type": "map", "values": "bytes"})
    sync = dec.read(16)
    nblocks = 0
    while dec.pos < len(dec.buf):
        dec.long()
        size = dec.long()
        dec.read(size)
        assert dec.read(16) == sync
        nblocks += 1
    assert nblocks > 1, "tiny block_bytes must produce multiple blocks"
