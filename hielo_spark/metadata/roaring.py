"""Portable roaring bitmaps — the container format Iceberg v3 deletion
vectors serialize row positions with.

Implements the PUBLIC RoaringFormatSpec "portable" layout
(https://github.com/RoaringBitmap/RoaringFormatSpec):

* 32-bit bitmap: little-endian cookie (``12347`` when no run
  containers, ``12346`` | (size−1)<<16 when runs are present), a
  descriptive header of (key, cardinality−1) uint16 pairs, an offset
  header (always with cookie 12347; with 12346 only when size ≥ 4),
  then the containers — sorted uint16 arrays (cardinality ≤ 4096),
  8 KiB bitsets (cardinality > 4096), or (start, length−1) run pairs.
* 64-bit extension (what Iceberg's ``deletion-vector-v1`` uses, the
  Roaring64NavigableMap portable form): an 8-byte little-endian bucket
  count, then per ascending high-32-bit key: the 4-byte key and the
  32-bit portable serialization of the low 32 bits.

The writer emits array/bitset containers only (runs are OPTIONAL for
writers under the spec); the reader accepts all three, so DVs written
by other engines (which may run-compress) decode too. Everything is
numpy-vectorized: positions never round-trip through Python loops
except per-container framing (containers are ≥ thousands of positions
each by construction).

Reference behavior: the reference engine trusts the ``iceberg`` crate
for DV decoding (Cargo.toml:18-20); this is a from-spec
reimplementation, byte-pinned by tests against hand-computed layouts.
"""

from __future__ import annotations

import struct

import numpy as np

SERIAL_COOKIE_NO_RUN = 12347
SERIAL_COOKIE_RUN = 12346
NO_OFFSET_THRESHOLD = 4
ARRAY_MAX = 4096


def _serialize_container(lows: np.ndarray) -> bytes:
    """One 16-bit container: sorted-array form ≤ 4096 values, else a
    65536-bit bitset (1024 little-endian uint64 words)."""
    if len(lows) <= ARRAY_MAX:
        return lows.astype("<u2").tobytes()
    bits = np.zeros(1024, dtype=np.uint64)
    idx = (lows >> 6).astype(np.int64)
    shift = (lows & 63).astype(np.uint64)
    np.bitwise_or.at(bits, idx, np.uint64(1) << shift)
    return bits.astype("<u8").tobytes()


def serialize_32(values) -> bytes:
    """Portable no-run serialization of a set of uint32 values."""
    vals64 = np.unique(np.asarray(values, dtype=np.uint64))
    if len(vals64) and int(vals64.max()) > 0xFFFFFFFF:
        # check BEFORE the narrowing cast — after it the max can never
        # exceed 32 bits and out-of-range values silently truncate
        raise ValueError("serialize_32 values must fit in 32 bits")
    vals = vals64.astype(np.uint32)
    keys = (vals >> np.uint32(16)).astype(np.uint32)
    lows = (vals & np.uint32(0xFFFF)).astype(np.uint32)
    uk, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(vals)]
    containers = []
    for i, k in enumerate(uk):
        c = lows[bounds[i]: bounds[i + 1]]
        containers.append((int(k), len(c), _serialize_container(c)))
    n = len(containers)
    out = bytearray(struct.pack("<II", SERIAL_COOKIE_NO_RUN, n))
    for k, card, _ in containers:
        out += struct.pack("<HH", k, card - 1)
    # offset header: byte offset of each container from the bitmap start
    off = 8 + 4 * n + 4 * n
    for _, _, data in containers:
        out += struct.pack("<I", off)
        off += len(data)
    for _, _, data in containers:
        out += data
    return bytes(out)


def _deserialize_container(
    buf: bytes, off: int, card: int, is_run: bool
) -> tuple[np.ndarray, int]:
    """→ (uint32 low values, bytes consumed)."""
    if is_run:
        (n_runs,) = struct.unpack_from("<H", buf, off)
        runs = np.frombuffer(buf, "<u2", count=2 * n_runs, offset=off + 2)
        runs = runs.astype(np.uint32).reshape(-1, 2)
        vals = (
            np.concatenate(
                [np.arange(s, s + ln + 1, dtype=np.uint32) for s, ln in runs]
            )
            if n_runs
            else np.empty(0, np.uint32)
        )
        return vals, 2 + 4 * n_runs
    if card <= ARRAY_MAX:
        vals = np.frombuffer(buf, "<u2", count=card, offset=off)
        return vals.astype(np.uint32), 2 * card
    words = np.frombuffer(buf, "<u8", count=1024, offset=off)
    bits = np.unpackbits(
        words.view(np.uint8), bitorder="little"
    )  # little-endian words → bit i of word w is value w*64+i
    return np.nonzero(bits)[0].astype(np.uint32), 8192


def deserialize_32(buf: bytes, base: int = 0) -> tuple[np.ndarray, int]:
    """Portable 32-bit bitmap at ``buf[base:]`` → (sorted uint32 values,
    total bytes consumed). Accepts both cookies (array/bitset/run
    containers)."""
    (cookie32,) = struct.unpack_from("<I", buf, base)
    if (cookie32 & 0xFFFF) == SERIAL_COOKIE_RUN:
        n = (cookie32 >> 16) + 1
        off = base + 4
        nbytes_flags = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, np.uint8, count=nbytes_flags, offset=off),
            bitorder="little",
        )[:n]
        off += nbytes_flags
        has_offsets = n >= NO_OFFSET_THRESHOLD
    elif cookie32 == SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, base + 4)
        off = base + 8
        run_flags = np.zeros(n, dtype=np.uint8)
        has_offsets = True
    else:
        raise ValueError(f"not a portable roaring bitmap (cookie {cookie32})")
    keys = np.empty(n, np.uint32)
    cards = np.empty(n, np.int64)
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, off + 4 * i)
        keys[i], cards[i] = k, cm1 + 1
    off += 4 * n
    if has_offsets:
        offsets = [
            base + struct.unpack_from("<I", buf, off + 4 * i)[0]
            for i in range(n)
        ]
        off += 4 * n
    else:
        offsets = None
    parts = []
    cur = off
    for i in range(n):
        at = offsets[i] if offsets is not None else cur
        lows, used = _deserialize_container(
            buf, at, int(cards[i]), bool(run_flags[i])
        )
        cur = at + used
        parts.append(
            (np.uint32(keys[i]) << np.uint32(16)) | lows
        )
    vals = np.concatenate(parts) if parts else np.empty(0, np.uint32)
    return vals, cur - base


def serialize_64(positions) -> bytes:
    """Portable 64-bit (bucketed) serialization — Iceberg DV payload:
    8-byte LE bucket count, then per ascending high-32 key: 4-byte key
    + portable 32-bit bitmap of the low 32 bits."""
    pos = np.unique(np.asarray(positions, dtype=np.uint64))
    if len(pos) and int(pos.max()) >> 63:
        raise ValueError("DV positions must be non-negative int64")
    high = (pos >> np.uint64(32)).astype(np.uint32)
    uh, starts = np.unique(high, return_index=True)
    bounds = list(starts) + [len(pos)]
    out = bytearray(struct.pack("<Q", len(uh)))
    for i, h in enumerate(uh):
        lows = (pos[bounds[i]: bounds[i + 1]] & np.uint64(0xFFFFFFFF)).astype(
            np.uint32
        )
        out += struct.pack("<I", int(h))
        out += serialize_32(lows)
    return bytes(out)


def deserialize_64(buf: bytes, base: int = 0) -> np.ndarray:
    """Portable 64-bit bitmap → sorted uint64 positions."""
    (n_buckets,) = struct.unpack_from("<Q", buf, base)
    off = base + 8
    parts = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", buf, off)
        off += 4
        lows, used = deserialize_32(buf, off)
        off += used
        parts.append(
            (np.uint64(high) << np.uint64(32)) | lows.astype(np.uint64)
        )
    return np.concatenate(parts) if parts else np.empty(0, np.uint64)
