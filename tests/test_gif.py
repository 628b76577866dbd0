"""GIF codec (operators/gif.py). The LZW width-growth rule is pinned by a
HAND-PACKED code stream simulated from the spec (decoder-independent of
the encoder — the round-trip alone could hide a conjugate width bug),
plus round-trips across palette sizes, interlace, and dictionary resets."""

from __future__ import annotations

import numpy as np
import pytest

from hielo_spark.operators import gif as G


def _pack_lsb(codes_widths):
    """Pack (code, width) pairs LSB-first, as GIF does."""
    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes_widths:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_width_growth_rule_hand_packed():
    """min_code_size=2: clear=4, end=5, table starts at 6 entries, width
    3. After decoding codes 1,2,3 the table reaches 8 entries = 2^3, so
    the NEXT code must be read at width 4 — the spec's growth point.
    Stream: CLEAR 1 2 3 (3 bits each) then 3 2 1 END (4 bits each)."""
    stream = _pack_lsb(
        [(4, 3), (1, 3), (2, 3), (3, 3), (3, 4), (2, 4), (1, 4), (5, 4)]
    )
    out = G._LZWDecoder(2).decode(stream)
    assert list(out) == [1, 2, 3, 3, 2, 1]


def test_lzw_kwkwk_case():
    """Code == table size references the entry being built: prev+prev[0]."""
    stream = _pack_lsb([(4, 3), (1, 3), (6, 3), (5, 3)])
    out = G._LZWDecoder(2).decode(stream)
    assert list(out) == [1, 1, 1]


def test_lzw_mid_stream_clear_resets_width():
    # CLEAR 1 2 3 → width now 4; CLEAR (at width 4) resets to width 3
    stream = _pack_lsb(
        [(4, 3), (1, 3), (2, 3), (3, 3), (4, 4), (3, 3), (1, 3), (5, 3)]
    )
    out = G._LZWDecoder(2).decode(stream)
    assert list(out) == [1, 2, 3, 3, 1]


@pytest.mark.parametrize("ncol", [2, 8, 100, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_palette_sizes(ncol, interlace):
    rng = np.random.default_rng(ncol)
    pal = np.unique(rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, len(pal), size=(37, 23))]
    dec = G.decode_gif(G.encode_gif(img, interlace=interlace))
    assert np.array_equal(dec, img)  # lossless


def test_roundtrip_dictionary_reset():
    # 300×300 uniform: long runs drive the dictionary to the 4096 cap
    img = np.zeros((300, 300, 3), dtype=np.uint8)
    assert np.array_equal(G.decode_gif(G.encode_gif(img)), img)


def test_extension_blocks_skipped_and_89a_header():
    img = np.full((4, 4, 3), 7, dtype=np.uint8)
    enc = bytearray(G.encode_gif(img))
    assert bytes(enc[:6]) == b"GIF89a"
    # splice a Graphic Control Extension before the image descriptor
    idx = enc.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(enc[:idx]) + gce + bytes(enc[idx:])
    assert np.array_equal(G.decode_gif(spliced), img)


def test_too_many_colors_refused():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        G.encode_gif(img)


def test_decode_image_routes_gif():
    from hielo_spark.operators.multimodal import decode_image

    img = np.array([[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 9, 9]]], np.uint8)
    assert np.array_equal(decode_image(G.encode_gif(img)), img)
