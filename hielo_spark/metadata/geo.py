"""Iceberg v3 ``geometry`` / ``geography`` — WKB read path.

Both types store each value as WKB (Well-Known Binary, the OGC
06-103r4 / ISO 19125 encoding; the type's CRS rides in the Iceberg
type string, not in the value). The engine has no geometry column
type, so the read planes surface these columns as WKT strings
(``POINT (1 2)``) — portable, comparable, and loss-free for the
coordinate structure.

Supports both byte orders, the seven core geometries (point,
linestring, polygon, multipoint, multilinestring, multipolygon,
geometrycollection), ISO Z/M/ZM type codes (+1000/+2000/+3000), and
EWKB's Z/M/SRID flag bits (PostGIS-style writers; the SRID is dropped
from the WKT body — CRS belongs to the column type). Unknown geometry
type codes raise loudly with the code named.
"""

from __future__ import annotations

import math
import struct

_NAMES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
    5: "MULTILINESTRING", 6: "MULTIPOLYGON", 7: "GEOMETRYCOLLECTION",
}
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


def _fmt(x: float) -> str:
    if math.isnan(x):
        return "NaN"
    s = repr(x)
    return s[:-2] if s.endswith(".0") else s


def _read_header(b: bytes, off: int) -> tuple[str, int, int, int]:
    """→ (endian_fmt, base_type, ndims, data_offset)."""
    if off >= len(b):
        raise ValueError("truncated WKB (no byte-order byte)")
    end = "<" if b[off] else ">"
    (code,) = struct.unpack_from(end + "I", b, off + 1)
    off += 5
    z = m = False
    if code & (_EWKB_Z | _EWKB_M | _EWKB_SRID):  # EWKB flag form
        z = bool(code & _EWKB_Z)
        m = bool(code & _EWKB_M)
        if code & _EWKB_SRID:
            off += 4  # skip the SRID word (CRS rides in the TYPE)
        base = code & 0xFFFF
    else:  # ISO form: +1000 Z, +2000 M, +3000 ZM
        base = code % 1000
        z = code // 1000 in (1, 3)
        m = code // 1000 in (2, 3)
    if base not in _NAMES:
        raise ValueError(f"unknown WKB geometry type code {code}")
    return end, base, 2 + z + m, off, z, m


def _coords(b: bytes, off: int, end: str, ndims: int, n: int):
    vals = struct.unpack_from(end + "d" * (ndims * n), b, off)
    pts = [
        " ".join(_fmt(v) for v in vals[i * ndims:(i + 1) * ndims])
        for i in range(n)
    ]
    return pts, off + 8 * ndims * n


def _suffix(z: bool, m: bool) -> str:
    return {(False, False): "", (True, False): " Z",
            (False, True): " M", (True, True): " ZM"}[(z, m)]


def _parse(b: bytes, off: int) -> tuple[str, int]:
    end, base, ndims, off, z, m = _read_header(b, off)
    name = _NAMES[base] + _suffix(z, m)
    if base == 1:  # point: no count — exactly one coordinate tuple
        pts, off = _coords(b, off, end, ndims, 1)
        if all(p == "NaN" for p in pts[0].split(" ")):
            return f"{name} EMPTY", off
        return f"{name} ({pts[0]})", off
    (n,) = struct.unpack_from(end + "I", b, off)
    off += 4
    if n == 0:
        return f"{name} EMPTY", off
    if base == 2:  # linestring
        pts, off = _coords(b, off, end, ndims, n)
        return f"{name} ({', '.join(pts)})", off
    if base == 3:  # polygon: n rings
        rings = []
        for _ in range(n):
            (rn,) = struct.unpack_from(end + "I", b, off)
            off += 4
            pts, off = _coords(b, off, end, ndims, rn)
            rings.append(f"({', '.join(pts)})")
        return f"{name} ({', '.join(rings)})", off
    # multi*/collection: n child geometries, each with its own header
    kids = []
    for _ in range(n):
        kid, off = _parse(b, off)
        if base in (4, 5, 6):
            # multipoint/-linestring/-polygon WKT drops the child's
            # geometry name, keeping only its coordinate body
            kid = kid.split(" ", 1 + (" Z" in kid or " M" in kid))[-1]
            kids.append(kid)
        else:
            kids.append(kid)
    return f"{name} ({', '.join(kids)})", off


def wkb_to_wkt(b) -> str | None:
    """WKB bytes → WKT string; null-safe."""
    if b is None:
        return None
    wkt, _off = _parse(bytes(b), 0)
    return wkt


# --------------------------------------------------------------- encoder
# (tests/fixtures only — simulates what a foreign v3 writer produces)


def _enc_coords(pts, ndims):
    out = bytearray()
    for p in pts:
        assert len(p) == ndims
        out += struct.pack("<" + "d" * ndims, *p)
    return out


def encode_wkb(kind: str, data, z: bool = False, m: bool = False,
               srid: int | None = None) -> bytes:
    """Little-endian WKB for tests. ``kind`` is a lowercase geometry
    name; ``data`` nests per WKT structure (point: tuple; linestring:
    [tuple]; polygon: [[tuple]]; multi*/collection: list of (kind,
    data) children for collections, plain child data otherwise).
    ``srid`` writes the EWKB flag+SRID form."""
    base = {
        "point": 1, "linestring": 2, "polygon": 3, "multipoint": 4,
        "multilinestring": 5, "multipolygon": 6,
        "geometrycollection": 7,
    }[kind]
    ndims = 2 + z + m
    if srid is not None:
        code = base | (_EWKB_Z if z else 0) | (_EWKB_M if m else 0) \
            | _EWKB_SRID
    else:
        code = base + 1000 * (1 if z and not m else 0) \
            + 2000 * (1 if m and not z else 0) \
            + 3000 * (1 if z and m else 0)
    out = bytearray(b"\x01") + struct.pack("<I", code)
    if srid is not None:
        out += struct.pack("<I", srid)
    if base == 1:
        out += _enc_coords([data], ndims)
    elif base == 2:
        out += struct.pack("<I", len(data)) + _enc_coords(data, ndims)
    elif base == 3:
        out += struct.pack("<I", len(data))
        for ring in data:
            out += struct.pack("<I", len(ring))
            out += _enc_coords(ring, ndims)
    elif base in (4, 5, 6):
        child = {4: "point", 5: "linestring", 6: "polygon"}[base]
        out += struct.pack("<I", len(data))
        for d in data:
            out += encode_wkb(child, d, z=z, m=m)
    else:
        out += struct.pack("<I", len(data))
        for ck, cd in data:
            out += encode_wkb(ck, cd, z=z, m=m)
    return bytes(out)


# ------------------------------------------------------------ WKT parser
# The WRITE half of the geo round trip: the read planes decode
# geometry/geography to WKT strings, so a row-level UPDATE's re-append
# must encode those strings back to WKB. Accepts exactly the grammar
# wkb_to_wkt emits (ISO names, Z/M/ZM, EMPTY, NaN ordinates, nested
# parens; multipoint children parenthesized or bare), emitting
# little-endian ISO-code WKB. Round-trip law pinned by tests:
# wkb_to_wkt(wkt_to_wkb(s)) == s for every rendered form.

import re as _re

_WKT_TOKEN = _re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+0-9.eE]+)")
_WKT_KINDS = {v: k for k, v in _NAMES.items()}


class _WktScan:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str | None:
        m = _WKT_TOKEN.match(self.s, self.i)
        return m.group(1) if m else None

    def take(self) -> str:
        m = _WKT_TOKEN.match(self.s, self.i)
        if not m:
            raise ValueError(f"truncated or invalid WKT: {self.s!r}")
        self.i = m.end()
        return m.group(1)

    def expect(self, t: str) -> None:
        got = self.take()
        if got != t:
            raise ValueError(
                f"expected {t!r}, got {got!r} in WKT {self.s!r}"
            )


def _wkt_number(p: _WktScan) -> float:
    tok = p.take()
    try:
        return float(tok)  # handles NaN too (wkb_to_wkt renders it)
    except ValueError:
        raise ValueError(
            f"expected a number, got {tok!r} in WKT {p.s!r}"
        ) from None


def _wkt_coords_one(p: _WktScan, ndims: int) -> bytes:
    return struct.pack(
        "<" + "d" * ndims, *(_wkt_number(p) for _ in range(ndims))
    )


def _wkt_coord_list(p: _WktScan, ndims: int) -> bytes:
    """``x y[, x y]*`` up to and INCLUDING the closing paren."""
    out = bytearray()
    n = 0
    while True:
        out += _wkt_coords_one(p, ndims)
        n += 1
        t = p.take()
        if t == ")":
            return struct.pack("<I", n) + bytes(out)
        if t != ",":
            raise ValueError(
                f"expected ',' or ')', got {t!r} in WKT {p.s!r}"
            )


def _wkt_rings(p: _WktScan, ndims: int) -> bytes:
    """``(ring), (ring)`` up to and INCLUDING the closing paren."""
    rings = []
    while True:
        p.expect("(")
        rings.append(_wkt_coord_list(p, ndims))
        t = p.take()
        if t == ")":
            return struct.pack("<I", len(rings)) + b"".join(rings)
        if t != ",":
            raise ValueError(
                f"expected ',' or ')', got {t!r} in WKT {p.s!r}"
            )


def _wkt_geom(p: _WktScan) -> bytes:
    name = p.take()
    base = _WKT_KINDS.get(name.upper())
    if base is None:
        raise ValueError(f"unknown WKT geometry {name!r} in {p.s!r}")
    z = m = False
    nxt = p.peek()
    if nxt and nxt.upper() in ("Z", "M", "ZM"):
        t = p.take().upper()
        z, m = "Z" in t, t.endswith("M")
    ndims = 2 + z + m
    code = base + (3000 if z and m else 1000 if z else 2000 if m else 0)
    out = bytearray(b"\x01") + struct.pack("<I", code)
    nxt = p.peek()
    if nxt and nxt.upper() == "EMPTY":
        p.take()
        if base == 1:  # empty point = all-NaN coordinates (the form
            out += struct.pack(  # wkb_to_wkt decodes back to EMPTY)
                "<" + "d" * ndims, *([float("nan")] * ndims)
            )
        else:
            out += struct.pack("<I", 0)
        return bytes(out)
    p.expect("(")
    if base == 1:  # point
        out += _wkt_coords_one(p, ndims)
        p.expect(")")
    elif base == 2:  # linestring
        out += _wkt_coord_list(p, ndims)
    elif base == 3:  # polygon
        out += _wkt_rings(p, ndims)
    else:  # multi* / collection: n children, each a full WKB value
        kids = []
        child_code = {4: 1, 5: 2, 6: 3}.get(base)
        child_hdr = (
            b"\x01" + struct.pack(
                "<I",
                (child_code or 0)
                + (3000 if z and m else 1000 if z else 2000 if m else 0),
            )
            if child_code
            else None
        )
        while True:
            if base == 7:
                kids.append(_wkt_geom(p))
            elif base == 4:  # multipoint: "(x y)" or bare "x y"
                if p.peek() == "(":
                    p.expect("(")
                    kids.append(child_hdr + _wkt_coords_one(p, ndims))
                    p.expect(")")
                else:
                    kids.append(child_hdr + _wkt_coords_one(p, ndims))
            elif base == 5:  # multilinestring: "(coord list)"
                p.expect("(")
                kids.append(child_hdr + _wkt_coord_list(p, ndims))
            else:  # multipolygon: "((ring), (ring))"
                p.expect("(")
                kids.append(child_hdr + _wkt_rings(p, ndims))
            t = p.take()
            if t == ")":
                break
            if t != ",":
                raise ValueError(
                    f"expected ',' or ')', got {t!r} in WKT {p.s!r}"
                )
        out += struct.pack("<I", len(kids)) + b"".join(kids)
    return bytes(out)


def wkt_to_wkb(s) -> bytes | None:
    """WKT string → little-endian ISO WKB; null-safe. The inverse of
    ``wkb_to_wkt`` over everything it emits (byte-exact round trips
    modulo byte order and EWKB→ISO code normalization — the SRID was
    already dropped on decode, the CRS rides in the Iceberg type)."""
    if s is None:
        return None
    p = _WktScan(str(s))
    b = _wkt_geom(p)
    if p.peek() is not None:
        raise ValueError(f"trailing content after WKT geometry: {s!r}")
    return b
