"""Portable roaring bitmaps (metadata/roaring.py): byte-level pins
hand-computed from the published RoaringFormatSpec, container-kind
crossovers, run-container reads, the 64-bit bucketed form Iceberg v3
deletion vectors use, and hypothesis roundtrips."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hielo_spark.metadata.roaring import (
    deserialize_32,
    deserialize_64,
    serialize_32,
    serialize_64,
)


def test_serialize_32_bytes_pinned():
    """Hand-computed portable layout for {1, 2, 0x10000}: cookie 12347,
    two containers (key 0 array [1,2], key 1 array [0]), offset header
    counted from the bitmap start."""
    b = serialize_32([1, 2, 0x10000])
    expect = (
        struct.pack("<II", 12347, 2)          # cookie, container count
        + struct.pack("<HH", 0, 1)            # key 0, cardinality-1
        + struct.pack("<HH", 1, 0)            # key 1, cardinality-1
        + struct.pack("<II", 24, 28)          # container offsets
        + struct.pack("<HH", 1, 2)            # key-0 array [1, 2]
        + struct.pack("<H", 0)                # key-1 array [0]
    )
    assert b == expect
    vals, used = deserialize_32(b)
    assert used == len(b)
    np.testing.assert_array_equal(vals, [1, 2, 0x10000])


def test_array_bitset_crossover_roundtrip():
    """4096 values stay an array container; 4097 become an 8 KiB
    bitset. Both decode to the same set."""
    small = np.arange(4096, dtype=np.uint32) * 3
    b = serialize_32(small)
    assert len(b) == 8 + 4 + 4 + 2 * 4096
    np.testing.assert_array_equal(deserialize_32(b)[0], small)

    big = np.arange(4097, dtype=np.uint32) * 2  # still one key bucket
    b2 = serialize_32(big)
    assert len(b2) == 8 + 4 + 4 + 8192  # bitset container
    np.testing.assert_array_equal(deserialize_32(b2)[0], big)


def test_run_container_reads():
    """Writers may skip run containers (we do) but readers MUST accept
    them: hand-build a run-cookie bitmap of one container holding the
    run (5, len-1=3) → {5,6,7,8}. n=1 < 4 so no offset header."""
    b = (
        struct.pack("<I", 12346 | ((1 - 1) << 16))  # run cookie, size 1
        + b"\x01"                                   # run-flag bitset
        + struct.pack("<HH", 0, 3)                  # key 0, card-1
        + struct.pack("<HHH", 1, 5, 3)              # 1 run: start 5 len-1 3
    )
    vals, used = deserialize_32(b)
    assert used == len(b)
    np.testing.assert_array_equal(vals, [5, 6, 7, 8])


def test_serialize_64_buckets_pinned():
    """64-bit form: 8-byte LE bucket count, then (4-byte high key +
    32-bit bitmap) per ascending key."""
    b = serialize_64([3, (1 << 32) + 7, 1 << 33])
    assert b[:8] == struct.pack("<Q", 3)
    assert struct.unpack_from("<I", b, 8)[0] == 0  # first bucket key
    np.testing.assert_array_equal(
        deserialize_64(b), [3, (1 << 32) + 7, 1 << 33]
    )


def test_rejects_garbage_and_sign_bit():
    with pytest.raises(ValueError, match="cookie"):
        deserialize_32(struct.pack("<II", 999, 0))
    with pytest.raises(ValueError, match="non-negative"):
        serialize_64([1 << 63])
    # range check must fire BEFORE the uint32 narrowing (a post-cast
    # check can never fire and out-of-range values silently truncate)
    with pytest.raises(ValueError, match="32 bits"):
        serialize_32([(1 << 32) + 5])


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40)), max_size=2000
    )
)
def test_hypothesis_roundtrip_64(xs):
    got = deserialize_64(serialize_64(xs))
    np.testing.assert_array_equal(got, np.unique(np.array(xs, np.uint64)))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=0xFFFFFFFF), max_size=2000
    )
)
def test_hypothesis_roundtrip_32(xs):
    vals, used = deserialize_32(serialize_32(xs))
    np.testing.assert_array_equal(vals, np.unique(np.array(xs, np.uint32)))


def test_dv_blob_framing_pinned():
    """deletion-vector-v1 blob framing per the Iceberg Puffin spec:
    4-byte big-endian length of magic+vector, magic D1 D3 39 64, the
    portable 64-bit vector, 4-byte big-endian CRC-32 of magic+vector."""
    import zlib

    from hielo_spark.metadata.puffin import decode_dv_payload, dv_payload

    p = dv_payload([0, 1, 100])
    vec = serialize_64([0, 1, 100])
    assert p[:4] == struct.pack(">I", 4 + len(vec))
    assert p[4:8] == bytes([0xD1, 0xD3, 0x39, 0x64])
    assert p[8: 8 + len(vec)] == vec
    assert p[-4:] == struct.pack(
        ">I", zlib.crc32(p[4: 8 + len(vec)]) & 0xFFFFFFFF
    )
    np.testing.assert_array_equal(decode_dv_payload(p), [0, 1, 100])

    # corruption fails loudly: flipped magic, flipped payload bit
    with pytest.raises(ValueError, match="magic"):
        decode_dv_payload(b"\x00\x00\x00\x04XXXX" + p[8:])
    bad = bytearray(p)
    bad[9] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_dv_payload(bytes(bad))
