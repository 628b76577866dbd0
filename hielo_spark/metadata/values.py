"""Iceberg single-value BINARY serialization (spec Appendix D,
https://iceberg.apache.org/spec/#binary-single-value-serialization —
public document): the encoding of per-column lower/upper bounds inside
``data_file`` manifest entries (fields 125/128, ``map<int, binary>``
keyed by schema field id).

Our stats plane carries bounds as Spark ``cast("string")`` forms (the
engine-extension ``*_str`` maps); these helpers convert between that
stringified form and the spec bytes so the write plane emits REAL
spec-conformant bounds and the read plane can consume a third-party
manifest's bounds. Encodings per the spec:

  boolean      0x00 / 0x01
  int, date    4-byte little-endian (date = days from 1970-01-01)
  long, time,
  timestamp(tz) 8-byte little-endian (micros from epoch)
  float        4-byte IEEE-754 little-endian
  double       8-byte IEEE-754 little-endian
  string       UTF-8 bytes
  binary/fixed raw bytes
  decimal(P,S) unscaled value, minimal two's-complement BIG-endian
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta, timezone

_EPOCH_DATE = date(1970, 1, 1)

#: Spark SQL dtype → Iceberg primitive type (the subset the stats plane
#: bounds; timestamps are written tz-less by our µs-normalized loaders)
SPARK_TO_ICEBERG = {
    "boolean": "boolean",
    "tinyint": "int", "smallint": "int", "int": "int",
    "bigint": "long",
    "float": "float", "double": "double",
    "date": "date",
    "timestamp": "timestamptz", "timestamp_ntz": "timestamp",
    "string": "string",
    "binary": "binary",
}


_EPOCH_DT = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _parse_ts_micros(s: str) -> int:
    """Spark's cast-to-string timestamp form → µs since epoch (UTC —
    the session tz is pinned UTC across this engine). Computed via a
    timedelta so PRE-EPOCH fractional seconds keep their sign
    (int(timestamp())*1e6 + microsecond is off by a second before
    1970 — timedelta normalization carries the fraction correctly)."""
    fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in s else "%Y-%m-%d %H:%M:%S"
    dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
    delta = dt - _EPOCH_DT
    return (
        delta.days * 86_400_000_000
        + delta.seconds * 1_000_000
        + delta.microseconds
    )


def _format_ts(micros: int) -> str:
    dt = datetime.fromtimestamp(micros // 1_000_000, tz=timezone.utc)
    frac = micros % 1_000_000
    base = dt.strftime("%Y-%m-%d %H:%M:%S")
    # trailing fraction zeros trimmed to match Spark's cast-to-string
    # form ('…05.1') — the skip-filter comparators compare these
    # lexicographically against JVM-plane bounds strings, and a padded
    # '…05.100000' sorts above its trimmed twin, falsely pruning files
    fs = f"{frac:06d}".rstrip("0")
    return f"{base}.{fs}" if fs else base


def serialize_value(iceberg_type: str, s: str) -> bytes:
    """Stringified value → Appendix D bytes. Raises on types the stats
    plane never bounds (struct/list/map/uuid/fixed/decimal-string)."""
    t = iceberg_type
    if t == "boolean":
        return b"\x01" if s.lower() in ("true", "1") else b"\x00"
    if t == "int":
        return struct.pack("<i", int(s))
    if t == "long":
        return struct.pack("<q", int(s))
    if t == "float":
        return struct.pack("<f", float(s))
    if t == "double":
        return struct.pack("<d", float(s))
    if t == "date":
        return struct.pack("<i", (date.fromisoformat(s) - _EPOCH_DATE).days)
    if t in ("timestamp", "timestamptz"):
        return struct.pack("<q", _parse_ts_micros(s))
    if t == "string":
        return s.encode("utf-8")
    if t == "binary":
        return s.encode("utf-8")  # stats never bound binary; defensive
    if t.startswith("decimal"):
        # unscaled int AT THE DECLARED SCALE ('1.5' under decimal(p,2)
        # is 150, not 15), minimal two's-complement big-endian
        from decimal import Decimal

        scale = 0
        if "(" in t:
            scale = int(t.split(",")[1].rstrip(") "))
        scaled = Decimal(s).scaleb(scale)
        unscaled = int(scaled)
        if unscaled != scaled:
            raise ValueError(
                f"value {s!r} does not fit scale {scale} of {t}"
            )
        # minimal length: non-negatives need bit_length+1 bits (sign
        # bit), negatives are minimal at (~v).bit_length()+1 bits —
        # -128 is ONE byte (0x80), which the symmetric formula overpads
        if unscaled >= 0:
            length = (unscaled.bit_length() + 8) // 8
        else:
            length = (~unscaled).bit_length() // 8 + 1
        return unscaled.to_bytes(length, "big", signed=True)
    raise ValueError(f"unsupported type for single-value serialization: {t}")


def deserialize_value(iceberg_type: str, b: bytes) -> str:
    """Appendix D bytes → the stringified form the read plane's
    skip-filter comparators consume (numbers as plain decimal strings,
    timestamps in Spark's cast-to-string shape)."""
    t = iceberg_type
    if t == "boolean":
        return "true" if b != b"\x00" else "false"
    if t == "int":
        return str(struct.unpack("<i", b)[0])
    if t == "long":
        return str(struct.unpack("<q", b)[0])
    if t == "float":
        v = struct.unpack("<f", b)[0]
        return str(int(v)) if float(v).is_integer() else repr(v)
    if t == "double":
        v = struct.unpack("<d", b)[0]
        return str(int(v)) if v.is_integer() else repr(v)
    if t == "date":
        return (_EPOCH_DATE + timedelta(days=struct.unpack("<i", b)[0])).isoformat()
    if t in ("timestamp", "timestamptz"):
        return _format_ts(struct.unpack("<q", b)[0])
    if t == "string":
        return b.decode("utf-8")
    if t == "binary":
        return b.decode("utf-8", errors="replace")
    if t.startswith("decimal"):
        unscaled = int.from_bytes(b, "big", signed=True)
        scale = 0
        if "(" in t:
            scale = int(t.split(",")[1].rstrip(") "))
        if scale == 0:
            return str(unscaled)
        sign = "-" if unscaled < 0 else ""
        digits = str(abs(unscaled)).rjust(scale + 1, "0")
        return f"{sign}{digits[:-scale]}.{digits[-scale:]}"
    raise ValueError(f"unsupported type for single-value deserialization: {t}")


# ---------------------------------------------------------------------------
# v3 default values — the spec's JSON single-value serialization
# (iceberg.apache.org/spec/#json-single-value-serialization), the
# subset our write plane produces: booleans/ints/floats/strings ride
# as native JSON; date / timestamp / timestamptz as their ISO strings.

def default_to_json(iceberg_type: str, value):
    """Python value → the JSON form stored under a schema field's
    ``initial-default`` / ``write-default`` keys. Raises ValueError for
    types we don't serialize (nested types have no defaults in our
    writer)."""
    if value is None:
        raise ValueError("a default value cannot be null (omit it)")
    t = iceberg_type
    if t == "boolean":
        return bool(value)
    if t in ("int", "long"):
        return int(value)
    if t in ("float", "double"):
        return float(value)
    if t in ("string", "uuid") or str(t).startswith("decimal"):
        return str(value)
    if t == "date":
        return value.isoformat() if isinstance(value, date) else str(value)
    if t in ("timestamp", "timestamptz"):
        if isinstance(value, datetime):
            return _format_ts(
                int((value if value.tzinfo else
                     value.replace(tzinfo=timezone.utc))
                    .timestamp() * 1_000_000)
            ) + ("+00:00" if t == "timestamptz" else "")
        return str(value)
    raise ValueError(
        f"no default-value serialization for Iceberg type {t!r}"
    )


def default_from_json(iceberg_type: str, j):
    """Inverse of :func:`default_to_json`: the stored JSON form → the
    Python value both read planes fill (F.lit / pyarrow array)."""
    t = iceberg_type
    if t == "date":
        return date.fromisoformat(str(j))
    if t in ("timestamp", "timestamptz"):
        s = str(j).replace(" ", "T")
        dt = datetime.fromisoformat(s)
        if t == "timestamptz" and dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt
    return j
