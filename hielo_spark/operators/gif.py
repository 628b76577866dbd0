"""GIF (87a/89a) codec in pure numpy + stdlib — no PIL.

Decoder scope: single-frame (first image block) GIF with global or local
color table, full variable-width LZW decompression (clear/end codes,
dictionary growth to 4096, table reset), interlaced (4-pass) and
non-interlaced row order, extension-block skipping. Animated GIFs decode
to their first frame. The encoder is the test twin: real LZW compression
(dictionary build, width growth, reset at 4096) over a ≤256-color
palette, optional interlace — all from the public specification.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------- LZW core
class _LZWDecoder:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    clear code resets the table, width grows when the next code would not
    fit, capped at 12 bits."""

    def __init__(self, min_code_size: int) -> None:
        self.min_code_size = min_code_size
        self.clear = 1 << min_code_size
        self.end = self.clear + 1
        self._reset()

    def _reset(self) -> None:
        self.table: list[bytes] = [bytes([i]) for i in range(self.clear)] + [b"", b""]
        self.width = self.min_code_size + 1
        self.prev: bytes | None = None

    def decode(self, data: bytes) -> bytes:
        out = bytearray()
        acc = 0
        nbits = 0
        for byte in data:
            acc |= byte << nbits  # GIF packs codes LSB-first
            nbits += 8
            while nbits >= self.width:
                code = acc & ((1 << self.width) - 1)
                acc >>= self.width
                nbits -= self.width
                if code == self.clear:
                    self._reset()
                    continue
                if code == self.end:
                    return bytes(out)
                if code < len(self.table):
                    entry = self.table[code]
                    if self.prev is not None and len(self.table) < 4096:
                        self.table.append(self.prev + entry[:1])
                elif code == len(self.table) and self.prev is not None:
                    entry = self.prev + self.prev[:1]  # the KwKwK case
                    if len(self.table) < 4096:
                        self.table.append(entry)
                else:
                    raise ValueError(f"invalid LZW code {code}")
                out += entry
                self.prev = entry
                if len(self.table) >= (1 << self.width) and self.width < 12:
                    self.width += 1
        return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW compression: dictionary of byte-strings → codes,
    width growth in step with the decoder's table size, reset at 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return ({bytes([i]): i for i in range(clear)}, end + 1, min_code_size + 1)

    table, next_code, width = fresh()
    emit(clear, width)
    w = b""
    for b in indices:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[w + c] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        w = c
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- container
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def decode_gif(b: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB of the first image block."""
    if b[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n

    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block {block:#x}")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos + 1)
        pos += 10
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(b, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image has no color table")
        min_code_size = b[pos]
        pos += 1
        data = bytearray()
        while b[pos] != 0:
            ln = b[pos]
            data += b[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = np.frombuffer(
            _LZWDecoder(min_code_size).decode(bytes(data)), np.uint8
        )
        if indices.size < w * h:
            raise ValueError("GIF pixel data truncated")
        grid = indices[: w * h].reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            out = np.empty_like(grid)
            out[_interlace_order(h)] = grid
            grid = out
        return palette[grid]
    raise ValueError("GIF contains no image block")


def encode_gif(
    img: np.ndarray, interlace: bool = False, min_code_size: int | None = None
) -> bytes:
    """(h, w, 3) uint8 with ≤256 distinct colors → GIF89a bytes (global
    color table, one image block, real LZW)."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <=256 distinct colors")
    bits = max(1, int(len(palette) - 1).bit_length())
    table_n = 1 << bits
    pal_bytes = np.zeros((table_n, 3), dtype=np.uint8)
    pal_bytes[: len(palette)] = palette
    mcs = min_code_size if min_code_size is not None else max(2, bits)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += pal_bytes.tobytes()
    grid = indices.reshape(h, w)
    if interlace:
        grid = grid[_interlace_order(h)]
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out += bytes([mcs])
    lzw = _lzw_encode(grid.astype(np.uint8).tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
