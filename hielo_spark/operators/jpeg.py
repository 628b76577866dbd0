"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec in pure numpy + stdlib —
no PIL, no libjpeg.

Why it exists: the reference treats image payloads as decodable columns;
this environment has no imaging library, and JPEG is the dominant
real-world format, so X5's decode stage implements the public baseline
spec directly. Scope (decoder): baseline DCT sequential (SOF0/1), 8-bit,
grayscale or YCbCr, 4:4:4 / 4:2:2 / 4:2:0 chroma sampling, restart
intervals, multiple DQT/DHT segments — PROGRESSIVE (SOF2, r7):
spectral selection, successive approximation (DC/AC first + refinement
scans with EOB runs and correction bits, T.81 Annex G) — and LOSSLESS
(SOF3, r7): the Annex H spatial predictors (all 7), 2-16-bit
precision, point transform, modulo-2^16 differences. Arithmetic
coding, hierarchical mode, and 12-bit DCT precision raise
NotImplementedError.

The encoders are the test twins: spec-valid sequential output
(SOI/APP0/DQT/SOF0/DHT/SOS/EOI, byte stuffing, optional restart markers)
plus a progressive encoder (SOF2 scan scripts with configurable spectral
bands) using flat quantization
tables and simple single-length canonical Huffman tables (12 DC symbols
at 4 bits, 162 AC symbols at 8 bits — valid per DHT's counts-per-length
encoding, just not size-optimal). The decoder never assumes those
choices: it builds general canonical codes from whatever DHT/DQT the
stream carries, which is what keeps the round-trip test honest.

Everything here is from the public spec; the zigzag order is generated
algorithmically (diagonal walk) and pinned against the published sequence
in tests.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------- DCT
def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: forward F = A @ f @ A.T,
    inverse f = A.T @ F @ A."""
    A = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            A[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return A


_A = _dct_matrix()


def _zigzag_order() -> np.ndarray:
    """The spec's zigzag scan as (block_index → raster_index), generated
    by the diagonal walk rather than typed in."""
    order = []
    for d in range(15):  # anti-diagonals r+c = d
        rng = range(d + 1)
        cells = [(r, d - r) for r in rng if r < 8 and d - r < 8]
        if d % 2 == 0:
            cells = cells[::-1]  # even diagonals run bottom-left → top-right
        order.extend(r * 8 + c for r, c in cells)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)


# ------------------------------------------------------------- bit plumbing
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, n_bits: int) -> None:
        for i in range(n_bits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                b = self._acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc = 0
                self._n = 0

    def align(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s


class _BitReader:
    """MSB-first bit reader over entropy-coded data; unstuffs 0xFF00 and
    stops at (reports) markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _next_byte(self) -> int:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            raise _MarkerHit(0xFF00 | nxt)
        self.pos += 1
        return b

    def bit(self) -> int:
        if self._n == 0:
            self._acc = self._next_byte()
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def byte_align(self) -> None:
        self._n = 0

    def skip_marker(self) -> int:
        """Consume a marker at the current (aligned) position."""
        assert self.data[self.pos] == 0xFF
        m = 0xFF00 | self.data[self.pos + 1]
        self.pos += 2
        return m


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


# ---------------------------------------------------------------- huffman
def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """DHT (counts-per-length, symbols) → {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """Same canonical assignment, inverted for the encoder: symbol →
    (code, length)."""
    return {s: (c, ln) for (ln, c), s in _canonical_codes(counts, symbols).items()}


def _read_huff_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in scan data")


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _extend(v: int, size: int) -> int:
    """Receive/extend (spec F.2.2.1): map the raw ``size`` bits back to a
    signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------- encoder
_DC_SYMBOLS = list(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12  # all 12 DC categories at 4 bits
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]  # EOB, ZRL, then (run, size)
_AC_COUNTS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8  # all at 8 bits


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _pad_to(x: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.pad(x, ((0, h - x.shape[0]), (0, w - x.shape[1])), mode="edge")


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    coef = _A @ (block - 128.0) @ _A.T
    # q is raster-order; quantize in raster space, then zigzag-scan
    qz = np.round(coef.reshape(64) / q).astype(np.int64)[ZIGZAG]
    # DC
    diff = int(qz[0]) - pred
    size = _category(diff)
    c, ln = dc_codes[size]
    bw.write(c, ln)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(qz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return int(qz[0])


def encode_jpeg(
    img: np.ndarray,
    quant: int = 8,
    subsample: bool = False,
    restart_interval: int = 0,
    gray: bool = False,
) -> bytes:
    """RGB (h, w, 3) uint8 → baseline JFIF bytes. ``subsample=True``
    writes 4:2:0 (chroma at half resolution); ``restart_interval`` > 0
    emits RSTn markers every that many MCUs; ``gray=True`` writes a
    single-component (luma-only) frame."""
    h, w, _ = img.shape
    ycc = _rgb_to_ycbcr(img)
    q_tab = np.full(64, float(quant))
    q_tab[0] = max(1.0, quant / 2)  # finer DC

    sx, sy = (2, 2) if (subsample and not gray) else (1, 1)
    mcu_w, mcu_h = 8 * sx, 8 * sy
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    y_plane = _pad_to(ycc[..., 0], mcus_y * mcu_h, mcus_x * mcu_w)
    cb_f = _pad_to(ycc[..., 1], mcus_y * mcu_h, mcus_x * mcu_w)
    cr_f = _pad_to(ycc[..., 2], mcus_y * mcu_h, mcus_x * mcu_w)
    if subsample:
        cb_f = cb_f.reshape(-1, 2, cb_f.shape[1] // 2, 2).mean(axis=(1, 3))
        cr_f = cr_f.reshape(-1, 2, cr_f.shape[1] // 2, 2).mean(axis=(1, 3))

    dc_codes = _encode_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _encode_codes(_AC_COUNTS, _AC_SYMBOLS)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (table 0, used by all components here)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(q_tab[ZIGZAG[i]]) for i in range(64)  # DQT stores zigzag order
    )
    # SOF0
    cids = (1,) if gray else (1, 2, 3)
    comps = b"".join(
        bytes([cid, (sx << 4) | sy if cid == 1 else 0x11, 0]) for cid in cids
    )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(cids), 8, h, w, len(cids)) + comps
    # DHT: DC table 0, AC table 0
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMBOLS), (1, _AC_COUNTS, _AC_SYMBOLS)):
        payload = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(cids), len(cids))
    out += b"".join(bytes([cid, 0x00]) for cid in cids)  # DC 0 / AC 0
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0

    bw = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.align()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0, 0, 0]
            # luma blocks (sy × sx per MCU)
            for by in range(sy):
                for bx in range(sx):
                    r0, c0 = my * mcu_h + by * 8, mx * mcu_w + bx * 8
                    preds[0] = _encode_block(
                        bw, y_plane[r0 : r0 + 8, c0 : c0 + 8], q_tab, preds[0],
                        dc_codes, ac_codes,
                    )
            if not gray:
                for ci, plane in ((1, cb_f), (2, cr_f)):
                    r0, c0 = my * 8, mx * 8
                    preds[ci] = _encode_block(
                        bw, plane[r0 : r0 + 8, c0 : c0 + 8], q_tab, preds[ci],
                        dc_codes, ac_codes,
                    )
            mcu_count += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoder twin

#: AC table for progressive scans: EOB0..EOB14 (run<<4, size 0), ZRL,
#: and the (run, size) pairs — 176 symbols, all at 8 bits (canonical)
_AC_PROG_SYMBOLS = [r << 4 for r in range(15)] + [0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_PROG_COUNTS = [0] * 7 + [len(_AC_PROG_SYMBOLS)] + [0] * 8


def _pt_toward_zero(v: int, al: int) -> int:
    """The spec's AC point transform: divide by 2^Al truncating TOWARD
    ZERO (an arithmetic shift would round negatives away from zero)."""
    return v >> al if v >= 0 else -((-v) >> al)


class _ProgACState:
    """Cross-block EOB-run state for one AC scan: the run length and the
    correction bits stashed to emit after the EOBn code (spec G.1.2.3 —
    each correction bit rides with the symbol whose decoding passes its
    coefficient)."""

    def __init__(self) -> None:
        self.eobrun = 0
        self.pending: list[int] = []

    def flush(self, bw: _BitWriter, ac_codes) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            c, ln = ac_codes[r << 4]
            bw.write(c, ln)
            if r:
                bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.pending:
            bw.write(bit, 1)
        self.pending = []


def _encode_ac_first_block(bw, blk, ss, se, al, ac_codes, state):
    run = 0
    for k in range(ss, se + 1):
        t = _pt_toward_zero(int(blk[k]), al)
        if t == 0:
            run += 1
            continue
        state.flush(bw, ac_codes)
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        size = _category(t)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(t if t >= 0 else t + (1 << size) - 1, size)
        run = 0
    if run:
        state.eobrun += 1
        if state.eobrun == 32767:
            state.flush(bw, ac_codes)


def _encode_ac_refine_block(bw, blk, ss, se, al, ac_codes, state):
    """Refinement coding by SIMULATING the decoder's pass structure:
    newly-nonzero coefficients emit (zero-run, 1) + sign; correction
    bits for already-nonzero coefficients are emitted exactly where the
    decoder consumes them (inline within the pass each symbol causes)."""
    t = [abs(int(v)) >> al for v in blk]
    pos = [int(v) >= 0 for v in blk]
    new_ks = [k for k in range(ss, se + 1) if t[k] == 1]
    k = ss
    for nk in new_ks:
        while sum(1 for j in range(k, nk) if t[j] == 0) > 15:
            state.flush(bw, ac_codes)
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            z = 0
            while z < 16:  # pass 16 zero-history coeffs, corrections inline
                if t[k] == 0:
                    z += 1
                elif t[k] > 1:
                    bw.write(t[k] & 1, 1)
                k += 1
        state.flush(bw, ac_codes)
        run = sum(1 for j in range(k, nk) if t[j] == 0)
        c, ln = ac_codes[(run << 4) | 1]
        bw.write(c, ln)
        bw.write(1 if pos[nk] else 0, 1)
        for j in range(k, nk):
            if t[j] > 1:
                bw.write(t[j] & 1, 1)
        k = nk + 1
    if k <= se:  # tail covered by an EOB run; corrections ride with it
        state.eobrun += 1
        state.pending.extend(t[j] & 1 for j in range(k, se + 1) if t[j] > 1)
        if state.eobrun == 32767:
            state.flush(bw, ac_codes)


def encode_jpeg_progressive(
    img: np.ndarray, quant: int = 8, gray: bool = False,
    bands: tuple[tuple[int, int], ...] = ((1, 63),),
) -> bytes:
    """RGB (h, w, 3) uint8 → PROGRESSIVE JFIF bytes (SOF2, 4:4:4): a
    four-stage scan script exercising every progressive scan type — DC
    first at Al=1 (interleaved), DC refinement, then per component AC
    first 1..63 at Al=1 and AC refinement to Al=0. The decoder twin
    never assumes this script; it follows whatever scans the stream
    declares."""
    h, w, _ = img.shape
    ycc = _rgb_to_ycbcr(img)
    q_tab = np.full(64, float(quant))
    q_tab[0] = max(1.0, quant / 2)
    bx_n = (w + 7) // 8
    by_n = (h + 7) // 8
    ncomp = 1 if gray else 3
    grids = []
    for ci in range(ncomp):
        plane = _pad_to(ycc[..., ci], by_n * 8, bx_n * 8)
        g = np.zeros((by_n, bx_n, 64), dtype=np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                block = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                coefs = _A @ (block - 128.0) @ _A.T
                g[by, bx] = np.round(
                    coefs.reshape(64) / q_tab
                ).astype(np.int64)[ZIGZAG]
        grids.append(g)

    dc_codes = _encode_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _encode_codes(_AC_PROG_COUNTS, _AC_PROG_SYMBOLS)
    cids = (1,) if gray else (1, 2, 3)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(q_tab[ZIGZAG[i]]) for i in range(64)
    )
    comps = b"".join(bytes([cid, 0x11, 0]) for cid in cids)
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp
    ) + comps
    for tc, counts, syms in (
        (0, _DC_COUNTS, _DC_SYMBOLS), (1, _AC_PROG_COUNTS, _AC_PROG_SYMBOLS)
    ):
        payload = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    def sos(sel, ss, se, ah, al):
        seg = bytes([len(sel)])
        seg += b"".join(bytes([cid, 0x00]) for cid in sel)
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg

    # scan 1: DC first, Al=1, interleaved (4:4:4 → one block per comp/MCU)
    out += sos(cids, 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * ncomp
    for by in range(by_n):
        for bx in range(bx_n):
            for ci in range(ncomp):
                v = int(grids[ci][by, bx, 0]) >> 1  # DC PT is arithmetic
                diff = v - preds[ci]
                preds[ci] = v
                size = _category(diff)
                c, ln = dc_codes[size]
                bw.write(c, ln)
                if size:
                    bw.write(diff if diff >= 0 else diff + (1 << size) - 1,
                             size)
    bw.align()
    out += bw.out
    # scan 2: DC refinement to Al=0 — one bit per block
    out += sos(cids, 0, 0, 1, 0)
    bw = _BitWriter()
    for by in range(by_n):
        for bx in range(bx_n):
            for ci in range(ncomp):
                bw.write(int(grids[ci][by, bx, 0]) & 1, 1)
    bw.align()
    out += bw.out
    # scans 3..: per-component, per-band AC first then AC refinement
    # (``bands`` beyond the default exercises spectral selection)
    for ci, cid in enumerate(cids):
        for ss_b, se_b in bands:
            out += sos((cid,), ss_b, se_b, 0, 1)
            bw, state = _BitWriter(), _ProgACState()
            for by in range(by_n):
                for bx in range(bx_n):
                    _encode_ac_first_block(
                        bw, grids[ci][by, bx], ss_b, se_b, 1, ac_codes, state)
            state.flush(bw, ac_codes)
            bw.align()
            out += bw.out
    for ci, cid in enumerate(cids):
        for ss_b, se_b in bands:
            out += sos((cid,), ss_b, se_b, 1, 0)
            bw, state = _BitWriter(), _ProgACState()
            for by in range(by_n):
                for bx in range(bx_n):
                    _encode_ac_refine_block(
                        bw, grids[ci][by, bx], ss_b, se_b, 0, ac_codes, state)
            state.flush(bw, ac_codes)
            bw.align()
            out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- decoder
def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB (grayscale expands to
    3 channels). See module docstring for scope."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (h, w, comps)
    restart_interval = 0
    scan = None
    prog_coef = None  # progressive: per-component zigzag coefficient grids

    while pos < len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", b, pos)
        seg = b[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64)
                tab[ZIGZAG] = np.frombuffer(seg[p : p + 64], np.uint8)
                qtables[tq] = tab
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                syms = list(seg[p + 17 : p + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _canonical_codes(counts, syms)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            # SOF0/1 sequential, SOF2 progressive, SOF3 lossless
            prec, fh, fw, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], struct.unpack_from(">H", seg, 3)[0], seg[5]
            if marker == 0xC3:
                if not 2 <= prec <= 16:
                    raise ValueError(f"invalid lossless precision {prec}")
            elif prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps, "prec": prec,
                     "progressive": marker == 0xC2,
                     "lossless": marker == 0xC3}
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline-sequential (SOF0/1), progressive (SOF2) and "
                "lossless (SOF3) JPEG (arithmetic/hierarchical modes "
                "unsupported)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            if frame is None:
                raise ValueError("SOS before SOF")
            if frame.get("lossless"):
                predictor = seg[1 + 2 * ns]           # Ss = predictor
                pt = seg[3 + 2 * ns] & 0xF            # Al = point transform
                return _decode_lossless_scan(
                    b, pos + seg_len, frame, scan, predictor, pt,
                    dc_tables, restart_interval,
                )
            if frame.get("progressive"):
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos += seg_len
                if prog_coef is None:
                    prog_coef = _alloc_progressive(frame)
                pos = _decode_progressive_scan(
                    b, pos, frame, scan, ss, se, ahal >> 4, ahal & 0xF,
                    prog_coef, dc_tables, ac_tables, restart_interval,
                )
                scan = None  # consumed; keep walking to the next marker
                continue
            pos += seg_len
            break  # sequential: entropy-coded data follows
        pos += seg_len

    if frame is not None and frame.get("progressive"):
        if prog_coef is None:
            raise ValueError("progressive JPEG with no scans")
        return _finish_progressive(frame, prog_coef, qtables)
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (frame["w"] + mcu_w - 1) // mcu_w
    mcus_y = (frame["h"] + mcu_h - 1) // mcu_h

    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    return _decode_scan(
        b, pos, frame, comps, scan, qtables, dc_tables, ac_tables,
        restart_interval, planes, mcus_x, mcus_y, hmax, vmax,
    )


# ------------------------------------------------------------- progressive


def _frame_geometry(frame):
    """(hmax, vmax, mcus_x, mcus_y, per-component natural block dims) —
    component i spans ceil(w*h_i/hmax) × ceil(h*v_i/vmax) samples, its
    non-interleaved block grid is that rounded up to whole blocks."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    nb = []
    for c in comps:
        cw = (frame["w"] * c["h"] + hmax - 1) // hmax
        ch = (frame["h"] * c["v"] + vmax - 1) // vmax
        nb.append(((ch + 7) // 8, (cw + 7) // 8))
    return hmax, vmax, mcus_x, mcus_y, nb


def _alloc_progressive(frame):
    """Per-component (BY, BX, 64) int64 zigzag coefficient grids sized to
    the padded MCU grid (interleaved DC scans write the pad blocks)."""
    hmax, vmax, mcus_x, mcus_y, _nb = _frame_geometry(frame)
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64)
        for c in frame["comps"]
    ]


def _decode_progressive_scan(
    b, pos, frame, scan, ss, se, ah, al, coef, dc_tables, ac_tables,
    restart_interval,
):
    """One progressive scan (T.81 §G.2) into the coefficient grids:
    DC first / DC refinement (interleaved or single-component), AC first
    with EOB runs, AC refinement with correction bits. Returns the byte
    position after the scan's entropy-coded data."""
    comps = frame["comps"]
    hmax, vmax, mcus_x, mcus_y, nb = _frame_geometry(frame)
    idx_of = {c["id"]: i for i, c in enumerate(comps)}
    br = _BitReader(b, pos)
    try:
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            preds = [0] * len(comps)
            members = [(idx_of[s["id"]], s) for s in scan]

            def dc_block(ci, s, by, bx):
                if ah == 0:
                    size = _read_huff_symbol(br, dc_tables[s["dc"]])
                    diff = _extend(br.bits(size), size) if size else 0
                    preds[ci] += diff
                    coef[ci][by, bx, 0] = preds[ci] << al
                elif br.bit():
                    # two's-complement OR matches the encoder's
                    # (value >> Al) & 1 bit for negatives too
                    coef[ci][by, bx, 0] |= 1 << al

            if len(scan) > 1:
                units = mcus_x * mcus_y
                unit = 0
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if restart_interval and unit and unit % restart_interval == 0:
                            br.byte_align()
                            m = br.skip_marker()
                            if not (0xFFD0 <= m <= 0xFFD7):
                                raise ValueError(f"expected RST, got {m:#x}")
                            preds = [0] * len(comps)
                        for ci, s in members:
                            c = comps[ci]
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    dc_block(ci, s,
                                             my * c["v"] + by,
                                             mx * c["h"] + bx)
                        unit += 1
            else:
                ci, s = members[0]
                bh, bw = nb[ci]
                unit = 0
                for by in range(bh):
                    for bx in range(bw):
                        if restart_interval and unit and unit % restart_interval == 0:
                            br.byte_align()
                            m = br.skip_marker()
                            if not (0xFFD0 <= m <= 0xFFD7):
                                raise ValueError(f"expected RST, got {m:#x}")
                            preds = [0] * len(comps)
                        dc_block(ci, s, by, bx)
                        unit += 1
        else:
            if len(scan) != 1:
                raise ValueError("progressive AC scans are single-component")
            s = scan[0]
            ci = idx_of[s["id"]]
            act = ac_tables[s["ac"]]
            grid = coef[ci]
            bh, bw = nb[ci]
            eobrun = 0
            unit = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        br.byte_align()
                        m = br.skip_marker()
                        if not (0xFFD0 <= m <= 0xFFD7):
                            raise ValueError(f"expected RST, got {m:#x}")
                        eobrun = 0
                    unit += 1
                    blk = grid[by, bx]
                    if ah == 0:
                        # AC first scan (G.2.2): values at precision Al,
                        # EOBn codes end runs of all-zero blocks
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            sym = _read_huff_symbol(br, act)
                            r, sz = sym >> 4, sym & 0xF
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.bits(r)
                                break
                            k += r
                            if k > se:
                                raise ValueError("AC run past band end")
                            blk[k] = _extend(br.bits(sz), sz) << al
                            k += 1
                    else:
                        # AC refinement (G.2.3): newly nonzero coeffs are
                        # ±1<<Al run/sign codes; already-nonzero coeffs
                        # consume one correction bit wherever passed
                        p1, m1 = 1 << al, -1 << al

                        def correct(k0, k1, stop_at_zero_run):
                            # advance from k0 while emitting correction
                            # bits; with stop_at_zero_run = r, stop after
                            # passing r zero-history coefficients and
                            # return that position
                            k = k0
                            r = stop_at_zero_run
                            while k <= k1:
                                if blk[k]:
                                    if br.bit() and not (blk[k] & p1):
                                        blk[k] += p1 if blk[k] > 0 else m1
                                else:
                                    if r == 0:
                                        return k
                                    r -= 1
                                k += 1
                            return k

                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                sym = _read_huff_symbol(br, act)
                                r, sz = sym >> 4, sym & 0xF
                                if sz == 0:
                                    if r < 15:
                                        eobrun = 1 << r
                                        if r:
                                            eobrun += br.bits(r)
                                        break
                                    # ZRL: pass 16 zero-history coeffs
                                    k = correct(k, se, 15)
                                    k += 1
                                    continue
                                if sz != 1:
                                    raise ValueError(
                                        "AC refinement codes only ±1")
                                val = p1 if br.bit() else m1
                                k = correct(k, se, r)
                                if k > se:
                                    raise ValueError("AC run past band end")
                                blk[k] = val
                                k += 1
                        if eobrun:
                            correct(k, se, 64)  # corrections to band end
                            eobrun -= 1
    except (_MarkerHit, IndexError) as e:
        raise ValueError("truncated or corrupt JPEG scan data") from e
    return br.pos


def _finish_progressive(frame, coef, qtables) -> np.ndarray:
    """Dequantize + inverse DCT every accumulated block (vectorized per
    component) and assemble like the sequential path."""
    comps = frame["comps"]
    hmax, vmax, _mx, _my, _nb = _frame_geometry(frame)
    planes = []
    for ci, comp in enumerate(comps):
        q = qtables[comp["tq"]]
        arr = coef[ci]
        deq = np.zeros(arr.shape, dtype=np.float64)
        deq[..., ZIGZAG] = arr * q[ZIGZAG]
        by, bx = arr.shape[0], arr.shape[1]
        blocks = deq.reshape(by, bx, 8, 8)
        spatial = np.einsum("ij,yxjk,kl->yxil", _A.T, blocks, _A) + 128.0
        planes.append(spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return _assemble_planes(frame, comps, planes, hmax, vmax)


def _decode_scan(
    b, pos, frame, comps, scan, qtables, dc_tables, ac_tables,
    restart_interval, planes, mcus_x, mcus_y, hmax, vmax,
):
    try:
        return _decode_scan_inner(
            b, pos, frame, comps, scan, qtables, dc_tables, ac_tables,
            restart_interval, planes, mcus_x, mcus_y, hmax, vmax,
        )
    except (_MarkerHit, IndexError) as e:
        # entropy-coded data ended (marker or buffer end) mid-MCU: the
        # payload is truncated/corrupt — surface the module's documented
        # error contract, not a private exception type
        raise ValueError("truncated or corrupt JPEG scan data") from e


def _decode_scan_inner(
    b, pos, frame, comps, scan, qtables, dc_tables, ac_tables,
    restart_interval, planes, mcus_x, mcus_y, hmax, vmax,
):
    scan_by_id = {s["id"]: s for s in scan}
    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.byte_align()
                m = br.skip_marker()
                if not (0xFFD0 <= m <= 0xFFD7):
                    raise ValueError(f"expected RST marker, got {m:#x}")
                preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                s = scan_by_id[comp["id"]]
                dct = dc_tables[s["dc"]]
                act = ac_tables[s["ac"]]
                q = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        qz = np.zeros(64, dtype=np.int64)
                        size = _read_huff_symbol(br, dct)
                        diff = _extend(br.bits(size), size) if size else 0
                        preds[ci] += diff
                        qz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _read_huff_symbol(br, act)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, sz = sym >> 4, sym & 0xF
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            qz[k] = _extend(br.bits(sz), sz)
                            k += 1
                        coef = np.zeros(64)
                        coef[ZIGZAG] = qz * q[ZIGZAG]
                        block = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                        r0 = (my * comp["v"] + by) * 8
                        c0 = (mx * comp["h"] + bx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
            mcu_count += 1

    return _assemble_planes(frame, comps, planes, hmax, vmax)


def _assemble_planes(frame, comps, planes, hmax, vmax) -> np.ndarray:
    """Upsample subsampled chroma planes, crop to the frame size, and
    convert to RGB — shared by the sequential and progressive paths."""
    h, w = frame["h"], frame["w"]
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        if comp["h"] != hmax or comp["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        y = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


# ------------------------------------------------------- lossless (SOF3)

#: Huffman table for lossless difference categories 0..16 (T.81 H.1.2:
#: SSSS up to 16; the Annex K DC table stops at 11) — 17 canonical
#: 5-bit codes, valid (17 < 2^5) and shared by encoder and decoder.
_LL_DC_SYMBOLS = list(range(17))
_LL_DC_COUNTS = [0, 0, 0, 0, 17] + [0] * 11


def _ll_predict(
    samples: np.ndarray, y: int, x: int, sel: int, default: int,
    fresh: bool,
) -> int:
    """T.81 H.1.2.1-2: a=left, b=above, c=above-left; the first sample
    (or the first after a restart) takes the default 2^(P-Pt-1), the
    rest of the first line predict from a, the first column predicts
    from b."""
    if fresh:
        return default
    if y == 0:
        return int(samples[0, x - 1])  # first line: predictor 1
    if x == 0:
        return int(samples[y - 1, 0])  # first column: predictor 2
    a = int(samples[y, x - 1])
    b = int(samples[y - 1, x])
    c = int(samples[y - 1, x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def _decode_lossless_scan(
    b: bytes, pos: int, frame, scan, predictor: int, pt: int,
    dc_tables, restart_interval: int,
) -> np.ndarray:
    """Lossless JPEG (T.81 Annex H): per sample, Huffman-decode the
    difference category with a DC table (SSSS 16 means +32768, no extra
    bits), extend, add the predicted value modulo 2^16, finally shift
    left by the point transform. Components interleave sample-by-sample
    (all must be unsubsampled); output maps the precision's high bits
    into the uint8 RGB contract (gray ×3 for one component, raw RGB for
    three — lossless JPEG defines no color transform)."""
    comps = frame["comps"]
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError("subsampled lossless JPEG")
    if len(scan) != len(comps):
        raise NotImplementedError("multi-scan lossless JPEG")
    prec = frame.get("prec", 8)
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    id2scan = {s["id"]: s for s in scan}
    tables = [dc_tables[id2scan[c["id"]]["dc"]] for c in comps]
    h, w = frame["h"], frame["w"]
    planes = [np.zeros((h, w), dtype=np.int64) for _ in comps]
    default = 1 << (prec - pt - 1)

    br = _BitReader(b, pos)
    fresh = [True] * len(comps)
    count = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                br.byte_align()
                m = br.skip_marker()
                if not 0xFFD0 <= m <= 0xFFD7:
                    raise ValueError(f"expected RSTn, got {m:#x}")
                fresh = [True] * len(comps)
            for ci, tab in enumerate(tables):
                ssss = _read_huff_symbol(br, tab)
                if ssss == 16:
                    diff = 32768
                elif ssss:
                    diff = _extend(br.bits(ssss), ssss)
                else:
                    diff = 0
                px = _ll_predict(
                    planes[ci], y, x, predictor, default, fresh[ci]
                )
                fresh[ci] = False
                planes[ci][y, x] = (px + diff) & 0xFFFF
            count += 1

    out = []
    for p in planes:
        v = p << pt
        v = v >> (prec - 8) if prec >= 8 else v << (8 - prec)
        out.append(np.clip(v, 0, 255).astype(np.uint8))
    if len(out) == 1:
        return np.repeat(out[0][:, :, None], 3, axis=2)
    if len(out) == 3:
        return np.stack(out, axis=2)
    raise NotImplementedError(f"{len(out)}-component lossless JPEG")


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 4,
    pt: int = 0,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """(h, w) or (h, w, 3) integer samples → lossless JFIF bytes
    (SOF3) — decode_jpeg's exact-round-trip twin. ``pt`` drops that
    many low bits before coding (the spec's point transform — the only
    lossy knob); ``restart_interval`` is in samples (MCUs). Samples
    must fit ``precision`` bits."""
    if img.ndim == 2:
        chans = [img]
    elif img.ndim == 3 and img.shape[2] == 3:
        chans = [img[:, :, i] for i in range(3)]
    else:
        raise ValueError("need (h, w) or (h, w, 3) samples")
    h, w = chans[0].shape
    if any(int(c.max(initial=0)) >= (1 << precision) for c in chans):
        raise ValueError(f"sample out of range for precision {precision}")
    planes = [np.asarray(c, dtype=np.int64) >> pt for c in chans]
    default = 1 << (precision - pt - 1)
    codes = _encode_codes(_LL_DC_COUNTS, _LL_DC_SYMBOLS)

    out = bytearray()
    out += b"\xff\xd8"
    cids = tuple(range(1, len(planes) + 1))
    comps = b"".join(bytes([cid, 0x11, 0]) for cid in cids)
    out += b"\xff\xc3" + struct.pack(
        ">HBHHB", 8 + 3 * len(cids), precision, h, w, len(cids)
    ) + comps
    payload = bytes([0x00]) + bytes(_LL_DC_COUNTS) + bytes(_LL_DC_SYMBOLS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(cids), len(cids))
    out += b"".join(bytes([cid, 0x00]) for cid in cids)
    out += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, Ah=0, Al=pt

    bw = _BitWriter()
    fresh = [True] * len(planes)
    rst = 0
    count = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                bw.align()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                fresh = [True] * len(planes)
            for ci, p in enumerate(planes):
                px = _ll_predict(p, y, x, predictor, default, fresh[ci])
                fresh[ci] = False
                diff = (int(p[y, x]) - px) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536  # modulo-2^16 signed window
                if diff == -32768:
                    c_, ln = codes[16]
                    bw.write(c_, ln)  # SSSS 16: no extra bits
                    continue
                size = _category(diff)
                c_, ln = codes[size]
                bw.write(c_, ln)
                if size:
                    bw.write(
                        diff if diff >= 0 else diff + (1 << size) - 1, size
                    )
            count += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
