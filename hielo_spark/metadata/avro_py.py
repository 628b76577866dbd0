"""Pure-Python Avro OBJECT CONTAINER FILE reader (no JVM, no pip) —
implemented from the published Avro 1.12 specification
(https://avro.apache.org/docs/1.12.0/specification/ — public document:
container format §"Object Container Files", binary encoding §"Binary
Encoding").

Why it exists: the JVM-backed reader in ``manifests.py`` drives Spark's
bundled Avro library through py4j, which only works where a
SparkSession's gateway lives. The Python DataSource API
(sources/iceberg_source.py) plans partitions and reads data inside
plain Python worker processes with NO JVM access — so manifest lists
and manifests must be decodable in pure Python. Scope: the subset the
Iceberg manifest formats use — records, maps, arrays, unions, strings,
bytes, fixed, enums, all primitives; ``null`` and ``deflate`` codecs
(zlib is stdlib; real Iceberg writers default to deflate).

Datum representation mirrors JSON: records/maps → dict, arrays → list,
bytes/fixed → bytes, unions unwrap to the branch value.
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"


class _Decoder:
    __slots__ = ("buf", "pos")

    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def long(self) -> int:
        """zigzag varint (spec: int and long share the encoding)."""
        shift = 0
        acc = 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def float_(self) -> float:
        return struct.unpack("<f", self.read(4))[0]

    def double(self) -> float:
        return struct.unpack("<d", self.read(8))[0]

    def bytes_(self) -> bytes:
        return self.read(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")

    def boolean(self) -> bool:
        return self.read(1) != b"\x00"


def _decode_datum(dec: _Decoder, schema):
    """One datum per the writer schema (JSON-parsed Avro schema)."""
    if isinstance(schema, list):  # union: long branch index, then value
        return _decode_datum(dec, schema[dec.long()])
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if isinstance(t, list):  # inline union as a field type
            return _decode_datum(dec, t)
    if t == "null":
        return None
    if t == "boolean":
        return dec.boolean()
    if t in ("int", "long"):
        return dec.long()
    if t == "float":
        return dec.float_()
    if t == "double":
        return dec.double()
    if t == "bytes":
        return dec.bytes_()
    if t == "string":
        return dec.string()
    if t == "fixed":
        return dec.read(int(schema["size"]))
    if t == "enum":
        return schema["symbols"][dec.long()]
    if t == "record":
        return {
            f["name"]: _decode_datum(dec, f["type"]) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = dec.long()
            if n == 0:
                break
            if n < 0:  # negative count → byte size follows (skippable blocks)
                dec.long()
                n = -n
            for _ in range(n):
                out.append(_decode_datum(dec, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = dec.long()
            if n == 0:
                break
            if n < 0:
                dec.long()
                n = -n
            for _ in range(n):
                k = dec.string()
                out[k] = _decode_datum(dec, schema["values"])
        return out
    raise ValueError(f"unsupported avro type {t!r}")


def _resolve_named(schema, defs=None):
    """Inline re-uses of named types (a second reference appears as a
    bare name string) — resolve against earlier definitions."""
    defs = defs if defs is not None else {}
    if isinstance(schema, list):
        return [_resolve_named(s, defs) for s in schema]
    if isinstance(schema, str):
        return defs.get(schema, schema)
    if not isinstance(schema, dict):
        return schema
    t = schema.get("type")
    if t in ("record", "fixed", "enum") and "name" in schema:
        defs[schema["name"]] = schema
    out = dict(schema)
    if t == "record":
        out["fields"] = [
            {**f, "type": _resolve_named(f["type"], defs)}
            for f in schema["fields"]
        ]
    elif t == "array":
        out["items"] = _resolve_named(schema["items"], defs)
    elif t == "map":
        out["values"] = _resolve_named(schema["values"], defs)
    elif isinstance(t, (dict, list)):
        out["type"] = _resolve_named(t, defs)
    return out


def read_avro_file(path: str) -> tuple[dict, dict[str, bytes], list]:
    """→ (writer schema JSON-dict, header metadata, decoded rows)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC:
        raise ValueError(f"not an Avro container file: {path}")
    dec = _Decoder(data)
    dec.pos = 4
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode_datum(dec, meta_schema)  # str keys, bytes values
    sync = dec.read(16)
    schema = _resolve_named(json.loads(meta["avro.schema"].decode("utf-8")))
    codec = meta.get("avro.codec", b"null")
    rows = []
    while dec.pos < len(dec.buf):
        n = dec.long()
        size = dec.long()
        block = dec.read(size)
        if codec == b"deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        elif codec != b"null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bdec = _Decoder(block)
        for _ in range(n):
            rows.append(_decode_datum(bdec, schema))
        if dec.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, meta, rows


# -- writer half (r5: the Python DataSource write path) --------------------


class _Encoder:
    __slots__ = ("out",)

    def __init__(self):
        self.out = bytearray()

    def long(self, v: int) -> None:
        """zigzag varint (int and long share the encoding)."""
        v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        # equivalent branch-free zigzag for arbitrary python ints:
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                break

    def bytes_(self, b: bytes) -> None:
        self.long(len(b))
        self.out += b

    def string(self, s: str) -> None:
        self.bytes_(s.encode("utf-8"))

    def boolean(self, v: bool) -> None:
        self.out.append(1 if v else 0)

    def float_(self, v: float) -> None:
        self.out += struct.pack("<f", v)

    def double(self, v: float) -> None:
        self.out += struct.pack("<d", v)


def _encode_datum(enc: _Encoder, schema, v) -> None:
    if isinstance(schema, list):  # union — this writer needs ["null", X]
        if len(schema) == 2 and schema[0] == "null":
            if v is None:
                enc.long(0)
                return
            enc.long(1)
            _encode_datum(enc, schema[1], v)
            return
        raise ValueError("writer supports only [null, X] unions")
    t = schema if isinstance(schema, str) else schema["type"]
    if isinstance(t, list):
        _encode_datum(enc, t, v)
        return
    if t == "null":
        return
    if t == "boolean":
        enc.boolean(bool(v))
    elif t in ("int", "long"):
        enc.long(int(v))
    elif t == "float":
        enc.float_(float(v))
    elif t == "double":
        enc.double(float(v))
    elif t == "bytes":
        enc.bytes_(bytes(v))
    elif t == "string":
        enc.string(str(v))
    elif t == "fixed":
        enc.out += bytes(v)
    elif t == "record":
        for f in schema["fields"]:
            _encode_datum(enc, f["type"], (v or {}).get(f["name"]))
    elif t == "array":
        items = v or []
        if items:
            enc.long(len(items))
            for x in items:
                _encode_datum(enc, schema["items"], x)
        enc.long(0)
    elif t == "map":
        entries = v or {}
        if entries:
            enc.long(len(entries))
            for k, val in entries.items():
                enc.string(str(k))
                _encode_datum(enc, schema["values"], val)
        enc.long(0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def write_avro_file(
    path: str,
    schema_json: str,
    rows: list,
    meta: dict | None = None,
    codec: str = "null",
    block_bytes: int = 1 << 18,
) -> None:
    """Pure-Python Avro container writer — byte-compatible with the
    JVM-written files (same container framing, same binary encoding),
    so the DataSource write path can compose manifests in worker
    processes with no JVM. Readable back by BOTH this module and
    Spark's Avro library (round-trip pinned in tests). ``codec`` may be
    ``"deflate"`` (raw zlib per the spec — what real Iceberg writers
    default to) or ``"null"``.

    Blocks flush at ~``block_bytes`` of encoded rows (256 KiB default —
    the same order real Avro writers use), so a 100k-entry manifest is
    many independently-decompressable blocks rather than one giant one;
    at read time a block is the decompression/memory unit."""
    import os as _os

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(schema_json)
    enc = _Encoder()
    enc.out += _MAGIC
    header_meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
                   "avro.codec": codec.encode()}
    for k, v in (meta or {}).items():
        header_meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    _encode_datum(enc, {"type": "map", "values": "bytes"}, header_meta)
    sync = _os.urandom(16)
    enc.out += sync
    resolved = _resolve_named(schema)

    def flush(block: "_Encoder", n: int) -> None:
        payload = bytes(block.out)
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)  # raw deflate per the spec
            payload = co.compress(payload) + co.flush()
        enc.long(n)
        enc.long(len(payload))
        enc.out += payload
        enc.out += sync

    block, n = _Encoder(), 0
    for row in rows:
        _encode_datum(block, resolved, row)
        n += 1
        if len(block.out) >= block_bytes:
            flush(block, n)
            block, n = _Encoder(), 0
    if n:  # zero blocks is valid Avro for an empty file
        flush(block, n)
    with open(path, "wb") as f:
        f.write(bytes(enc.out))
