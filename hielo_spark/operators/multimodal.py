"""X5 — multimodal (image/audio/video) column plumbing (SURVEY §2.8).

Media lives in DataFrames as an opaque ``binary`` payload plus a typed
metadata struct — the same shape ``spark.read.format('binaryFile')``
produces, and what an Iceberg table with a binary column stores:

    media: struct<uri: string, mime: string, n_bytes: long, payload: binary>

Decode / feature-extract stages run as ``mapInPandas`` stages: Arrow
batches in, Arrow batches out, so payload bytes never pass through Python
row-by-row. Codec status (r4): **PPM (P6), 24-bit uncompressed BMP, and
non-interlaced 8-bit PNG (gray/gray+alpha/RGB/RGBA) decode for real** —
PPM/BMP with numpy alone, PNG with stdlib ``zlib`` + numpy (full filter
reconstruction: None/Sub/Up/Average/Paeth per the public PNG spec).
Nearest-neighbor resize is numpy index striding. Baseline AND
progressive (SOF2, r7) JPEG decode for real (pure-numpy ITU-T T.81
implementation in operators/jpeg.py: Huffman + dequant + IDCT + chroma
upsampling + Annex G successive approximation), as does GIF
(operators/gif.py: full variable-width LZW, interlace, palettes). PNG
covers every legal bit depth — 1/2/4-bit packed gray+palette, 8- and
16-bit — and Adam7 interlace (r7). Audio decodes for real (RIFF/WAVE
8/16-bit PCM, mono IMA-ADPCM, MS-ADPCM, and G.711 µ-law/A-law (r7) +
DSP features), as does video frame extraction from uncompressed AVI
('00db' DIB frames — same RIFF walk as WAV, same pixel layout as
BMP). JPEG covers baseline, progressive (SOF2), and lossless (SOF3,
Annex H) — see operators/jpeg.py. The remaining stub boundary is
small and documented: arithmetic-coded JPEG, non-MJPG AVI fourccs,
and perceptual-codec WAV tags (MP3/AAC-in-WAV) raise
NotImplementedError (no PIL/ffmpeg in this environment) unless
``fake=True`` selects the deterministic stand-in — the Spark-side
plumbing (schemas, batching, partitioning) is identical on every
path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_STRUCT = StructType(
    [
        StructField("uri", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("uri", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Test/demo helper: deterministic binary payloads derived from the id
    (stands in for `spark.read.format('binaryFile')` output)."""
    k = F.col(id_col)
    payload = F.encode(F.concat(F.lit("IMGDATA:"), F.repeat(F.md5(k.cast("string")), 4)), "utf-8")
    return df.withColumn(
        "media",
        F.struct(
            F.concat(F.lit("s3://media/img_"), k, F.lit(".png")).alias("uri"),
            F.lit("image/png").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            payload.alias("payload"),
        ),
    )


def attach_ppm_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic VALID 4×4 P6 payloads derived from the id (md5 hex →
    48 RGB bytes via unhex, all JVM expressions) — the real-decode twin of
    ``attach_fake_media``; `decode_image_features(fake=False)` actually
    decodes these."""
    k = F.col(id_col)
    header = F.encode(F.lit("P6\n4 4\n255\n"), "utf-8")
    body = F.unhex(F.repeat(F.md5(k.cast("string")), 3))  # 3×16 = 48 bytes
    payload = F.concat(header, body)
    return df.withColumn(
        "media",
        F.struct(
            F.concat(F.lit("s3://media/img_"), k, F.lit(".ppm")).alias("uri"),
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            payload.alias("payload"),
        ),
    )


def attach_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic VALID 4×4 RGB PNG payloads with the SAME pixel bytes
    as ``attach_ppm_media`` (md5-hex → 48 RGB bytes), zlib-compressed in
    an Arrow batch stage with the per-row filter type cycling through all
    five PNG filters — the compressed-format twin; `decode_image_features
    (fake=False)` really inflates + unfilters these. Every 4th id is
    written as a PALETTE PNG (color type 3, r5) of the same pixels, so
    the registry corpus exercises the PLTE decode path alongside
    truecolor under one mime type."""
    import hashlib

    from pyspark.sql.types import BinaryType as _Bin

    @F.pandas_udf(_Bin())
    def make_png(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            hx = hashlib.md5(str(int(i)).encode()).hexdigest()
            img = np.frombuffer(bytes.fromhex(hx * 3), np.uint8).reshape(4, 4, 3)
            if int(i) % 4 == 3:
                out.append(encode_png_palette(img))
            else:
                out.append(encode_png(img, filter_type=int(i) % 5))
        return pd.Series(out)

    k = F.col(id_col)
    payload = make_png(k.cast("long"))
    return df.withColumn(
        "media",
        F.struct(
            F.concat(F.lit("s3://media/img_"), k, F.lit(".png")).alias("uri"),
            F.lit("image/png").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            payload.alias("payload"),
        ),
    )


def decode_ppm(b: bytes) -> np.ndarray:
    """P6 PPM → (h, w, 3) uint8. Pure numpy; header is 'P6 <w> <h>
    <maxval>' in whitespace-separated ASCII, then binary RGB."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header tokens may be separated by any whitespace and '#' comments
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        tokens.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB. Pure numpy;
    BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER, rows bottom-up and
    padded to 4-byte multiples, pixels stored BGR."""
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got {bpp} bpp, compression {compression})")
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        b, dtype=np.uint8, count=row_bytes * abs(h), offset=data_offset
    ).reshape(abs(h), row_bytes)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:
        rows = rows[::-1]  # bottom-up → top-down
    return rows[:, :, ::-1]  # BGR → RGB


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_unfilter_row(
    f: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Reconstruct one scanline per the PNG filter spec (filter type
    ``f``): Recon(x) = Filt(x) + predictor, mod 256. None/Up vectorize;
    Sub/Average/Paeth have a per-byte serial dependency on the
    just-reconstructed left neighbor, so they scan the row."""
    n = row.shape[0]
    if f == 0:
        return row.copy()
    if f == 2:
        return (row + prev) & 0xFF
    cur = np.empty(n, dtype=np.int64)
    for x in range(n):
        a = cur[x - bpp] if x >= bpp else 0  # left (already reconstructed)
        b_ = prev[x]                         # up
        if f == 1:
            pred = a
        elif f == 3:
            pred = (a + b_) >> 1
        elif f == 4:
            c = prev[x - bpp] if x >= bpp else 0  # upper-left
            p = a + b_ - c
            pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        cur[x] = (row[x] + pred) & 0xFF
    return cur


#: Adam7 interlace pass origins/strides, per the PNG spec: each pass is
#: an independently filtered sub-image over the pixels at
#: (x0 + i*dx, y0 + j*dy)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter_block(
    raw: np.ndarray, offset: int, stride: int, height: int, bpp: int
) -> tuple[np.ndarray, int]:
    """Unfilter ``height`` scanlines of ``stride`` bytes starting
    at ``offset`` in the decompressed stream; returns ``(rows, next
    offset)`` — shared by the sequential image and each Adam7 pass
    (passes restart the filter predictor: prev row = zeros). ``stride``
    is ceil(width·channels·depth/8), so sub-byte rows stay packed here
    (the spec filters PACKED bytes with bpp=1)."""
    need = (stride + 1) * height
    if offset + need > raw.size:
        raise ValueError("PNG scanline data has wrong size")
    block = raw[offset:offset + need].reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        cur = _png_unfilter_row(
            int(block[y, 0]), block[y, 1:].astype(np.int64), prev, bpp
        )
        out[y] = cur
        prev = cur
    return out, offset + need


def _png_unpack_subbyte(
    rows: np.ndarray, depth: int, width: int
) -> np.ndarray:
    """Packed sub-byte scanlines → (h, width) sample values. PNG packs
    samples MSB-first within each byte; trailing pad bits in the last
    byte of a row are ignored."""
    bits = np.unpackbits(rows, axis=1)
    h = rows.shape[0]
    groups = bits.reshape(h, -1, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (groups * weights).sum(axis=2)[:, :width].astype(np.uint8)


def encode_png_subbyte(
    samples: np.ndarray,
    depth: int,
    color: int = 0,
    plte: bytes | None = None,
    filter_type: int = 0,
) -> bytes:
    """Sub-byte (1/2/4-bit) PNG writer for gray (color 0) or palette
    (color 3) SAMPLE values — decode_png's fixture twin: packs samples
    MSB-first per scanline and forward-filters the PACKED bytes (the
    same bpp=1 spec arithmetic the decoder inverts)."""
    import struct
    import zlib

    if depth not in (1, 2, 4):
        raise ValueError(f"not a sub-byte depth: {depth}")
    if int(samples.max(initial=0)) >= (1 << depth):
        raise ValueError(f"sample value out of range for depth {depth}")
    h, w = samples.shape
    weights = np.arange(depth - 1, -1, -1)
    bits = (samples[:, :, None] >> weights) & 1
    packed = np.packbits(bits.reshape(h, -1).astype(np.uint8), axis=1)
    rows = []
    prev = np.zeros(packed.shape[1], dtype=np.int64)
    for y in range(h):
        cur = packed[y].astype(np.int64)
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(1, dtype=np.int64), cur[:-1]])
            filt = (cur - left) & 0xFF
        elif filter_type == 2:
            filt = (cur - prev) & 0xFF
        else:
            raise ValueError(f"unsupported fixture filter {filter_type}")
        rows.append(bytes([filter_type]) + bytes(filt.astype(np.uint8)))
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    out = PNG_SIGNATURE + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    )
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG needs a PLTE")
        out += chunk(b"PLTE", plte)
    return out + chunk(
        b"IDAT", zlib.compress(b"".join(rows))
    ) + chunk(b"IEND", b"")


def decode_png(b: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8 RGB. Stdlib zlib + numpy: chunk walk
    (IHDR/PLTE/IDAT/IEND), one zlib stream across all IDAT chunks,
    per-scanline filter reconstruction. 8- AND 16-bit depths (16-bit
    samples are big-endian; filters operate on BYTES with bpp doubled,
    per the spec — output takes the high byte), sequential AND Adam7
    interlaced (each pass an independently filtered sub-image).
    Gray/gray+alpha expand to RGB; RGBA drops alpha (composite against
    black would need a policy choice — features use color planes only);
    palette (color type 3, r5) indexes the PLTE RGB triples, tRNS alpha
    dropped like RGBA. Sub-byte depths (1/2/4-bit gray and palette, r7)
    unpack MSB-first after byte-level unfiltering (spec: packed rows
    filter with bpp=1) and gray samples scale to full range."""
    import struct
    import zlib

    if b[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    pos = 8
    ihdr: tuple | None = None
    idat = bytearray()
    plte: bytes | None = None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"unknown PNG color type {color}")
    sub_byte = depth < 8
    if sub_byte and color not in (0, 3):
        raise ValueError(
            f"depth-{depth} PNG is only legal for gray/palette "
            f"(got color type {color})"
        )
    if color == 3:
        if depth == 16:
            raise ValueError("16-bit palette PNG is not a legal combination")
        if plte is None or len(plte) % 3 != 0 or not plte:
            raise ValueError("palette PNG missing/malformed PLTE")
    # filter byte distance = ceil(bits per pixel / 8): sub-byte rows
    # filter on PACKED bytes with bpp 1, per the spec
    bpp = max((channels * depth + 7) // 8, 1)

    def stride_of(width: int) -> int:
        return (width * channels * depth + 7) // 8

    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 0:
        out, end = _png_unfilter_block(raw, 0, stride_of(w), h, bpp)
        if end != raw.size:
            raise ValueError("PNG scanline data has wrong size")
        if sub_byte:
            bytes_img = _png_unpack_subbyte(out, depth, w)[:, :, None]
        else:
            bytes_img = out.reshape(h, w, bpp)
    else:
        # Adam7: seven passes, each its own filtered sub-image; pixels
        # scatter back to (x0 + i*dx, y0 + j*dy). Sub-byte passes pack
        # their OWN rows (pass stride = ceil(pw·depth/8)).
        bytes_img = np.zeros((h, w, 1 if sub_byte else bpp), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, offset = _png_unfilter_block(
                raw, offset, stride_of(pw), ph, bpp
            )
            if sub_byte:
                bytes_img[y0::dy, x0::dx, 0] = _png_unpack_subbyte(
                    rows, depth, pw
                )
            else:
                bytes_img[y0::dy, x0::dx] = rows.reshape(ph, pw, bpp)
        if offset != raw.size:
            raise ValueError("PNG scanline data has wrong size")
    if depth == 16:
        # big-endian 16-bit samples → high byte (the spec's 16→8
        # downsample within our uint8 RGB feature contract)
        img = bytes_img.reshape(h, w, channels, 2)[:, :, :, 0]
    elif sub_byte and color == 0:
        # spec sample scaling to full range: v · 255/(2^depth − 1),
        # integer-exact (255, 85, 17 for depths 1/2/4)
        img = (bytes_img * (255 // ((1 << depth) - 1))).astype(np.uint8)
    else:
        img = bytes_img
    if color == 3:
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("palette index out of PLTE range")
        return palette[idx]
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    if channels == 2:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer (8-bit RGB, one IDAT, chosen per-row filter) —
    the test/fixture twin of decode_png; forward-filters with the same
    spec arithmetic the decoder inverts."""
    import struct
    import zlib

    h, w, _ = img.shape
    x = img.astype(np.int64)
    stride = w * 3
    flat = x.reshape(h, stride)
    rows = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(3, dtype=np.int64), cur[:-3]])
            filt = (cur - left) & 0xFF
        elif filter_type == 2:
            filt = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(3, dtype=np.int64), cur[:-3]])
            filt = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            filt = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                b_ = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                filt[i] = (cur[i] - pred) & 0xFF
        else:
            raise ValueError(f"invalid filter type {filter_type}")
        rows.append(bytes([filter_type]) + bytes(filt.astype(np.uint8)))
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(rows))
    return PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def encode_png_palette(img: np.ndarray) -> bytes:
    """Palette (color type 3) PNG writer — the fixture twin of the r5
    PLTE decode path: distinct RGB colors (≤256) become the PLTE, pixels
    become 8-bit indices (filter 0 rows). Raises on richer images; this
    is a fixture/registry encoder, not a quantizer."""
    import struct
    import zlib

    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if palette.shape[0] > 256:
        raise ValueError(f"{palette.shape[0]} distinct colors (palette max 256)")
    rows = idx.astype(np.uint8).reshape(h, w)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rows[y]) for y in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image(b: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from a PPM(P6) / uncompressed-BMP / 8-bit
    non-interlaced PNG / baseline JPEG payload (r4: the JPEG path is the
    pure-numpy T.81 decoder in operators/jpeg.py — progressive and
    arithmetic-coded JPEGs raise from there); other formats raise
    NotImplementedError."""
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == PNG_SIGNATURE:
        return decode_png(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(b)
    raise NotImplementedError(
        "unknown image format (PPM/BMP/PNG/GIF/baseline-JPEG decode "
        "natively; use fake=True for the deterministic stand-in)"
    )


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index striding — the standard cheap
    normalization before feature extraction; pure numpy."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]


def image_feature_vector(img: np.ndarray, feature_dim: int = 8) -> list[float]:
    """Deterministic per-image features: per-channel means and stds (in
    [0, 1]), aspect ratio, overall brightness — padded/truncated to
    ``feature_dim``."""
    x = img.astype(np.float64) / 255.0
    feats = [
        *(x[:, :, c].mean() for c in range(3)),
        *(x[:, :, c].std() for c in range(3)),
        img.shape[1] / img.shape[0],
        x.mean(),
    ]
    feats = feats[:feature_dim] + [0.0] * max(0, feature_dim - len(feats))
    return [float(round(v, 6)) for v in feats]


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    feature_dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract stage over a media column via mapInPandas.

    The real path decodes PPM/uncompressed-BMP payloads with the numpy
    codecs above and extracts ``image_feature_vector``; compressed
    payloads raise NotImplementedError at execution time (swap PIL/
    torchvision into the same iterator in an environment that has them —
    batch shape, schema, and partitioning are identical). ``fake=True``
    keeps the deterministic metadata-derived stand-in for pipelines whose
    fixtures carry non-decodable payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                out = {
                    "doc_id": pdf[id_col].astype("int64"),
                    "uri": [m["uri"] for m in pdf[media_col]],
                    # fake decode: dimensions + features derived from payload
                    # bytes, deterministic per row
                    "width": [(len(m["payload"] or b"") % 64) + 1 for m in pdf[media_col]],
                    "height": [((len(m["payload"] or b"") // 2) % 64) + 1 for m in pdf[media_col]],
                    "feature": [
                        [float((m["payload"] or b"\x00")[i % max(len(m["payload"] or b"\x00"), 1)]) / 255.0 for i in range(feature_dim)]
                        for m in pdf[media_col]
                    ],
                }
                yield pd.DataFrame(out)
                continue
            ids, uris, widths, heights, feats = [], [], [], [], []
            for doc_id, m in zip(pdf[id_col], pdf[media_col]):
                if m is None or m["payload"] is None:
                    continue  # null media: skip, never TypeError the stage
                img = decode_image(bytes(m["payload"]))
                ids.append(int(doc_id))
                uris.append(m["uri"])
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                feats.append(image_feature_vector(img, feature_dim))
            if not ids:
                continue  # all-null batch: an empty frame would carry
                          # wrong dtypes into Arrow (float64 'feature')
            yield pd.DataFrame(
                {"doc_id": ids, "uri": uris, "width": widths, "height": heights, "feature": feats}
            )

    return df.select(id_col, media_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, media_col: str = "media", every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* stub: emits one row per sampled frame
    index based on metadata (duration inferred from n_bytes in the fake
    model). The decode of each frame is the stubbed stage above; the
    explode/partition shape is the real scale concern and is real here."""
    n_frames = (F.col(f"{media_col}.n_bytes") / F.lit(1024)).cast("int") + 1
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))),
    )


# --------------------------------------------------------------------------
# Audio (WAV/PCM) — the audio half of X5. RIFF is a public container
# format parseable with stdlib struct + numpy alone, so unlike JPEG this
# path decodes for REAL: chunk walk (fmt /data), 16-bit signed and 8-bit
# unsigned PCM, multi-channel→mono mean. Features are plain DSP (RMS,
# zero-crossing rate, spectral centroid via rfft) — deterministic and
# analytically pinnable in tests (sine at f: rms=A/√2, zcr=2f/sr,
# centroid≈f).
# --------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("uri", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", FloatType(), True),
        StructField("rms", FloatType(), True),
        StructField("zero_crossing_rate", FloatType(), True),
        StructField("spectral_centroid_hz", FloatType(), True),
    ]
)


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Minimal RIFF/WAVE writer (mono PCM, 16-bit signed or 8-bit
    unsigned) — the fixture twin of decode_wav. ``samples`` are floats in
    [-1, 1]."""
    import struct

    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if bits == 16:
        pcm = (x * 32767.0).round().astype("<i2").tobytes()
    elif bits == 8:
        pcm = ((x * 127.0).round() + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("only 8/16-bit PCM")
    byte_rate = sample_rate * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (mono float64 samples in [-1, 1], sample_rate).
    Stdlib struct chunk walk; PCM 16-bit signed / 8-bit unsigned; n>1
    channels are averaged to mono. Compressed WAV (non-PCM format tags)
    raises NotImplementedError."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt: tuple | None = None
    data: bytes | None = None
    while pos + 8 <= len(b):
        ctype = b[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        chunk = b[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            base = struct.unpack_from("<HHIIHH", chunk)
            extra = ()
            if len(chunk) >= 20:
                extra = struct.unpack_from("<HH", chunk, 16)
            fmt = base + extra
        elif ctype == b"data":
            data = chunk
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt /data chunk")
    audio_format, n_channels, sample_rate, _rate, _align, bits = fmt[:6]
    if audio_format == 17:
        # IMA ADPCM: block_align from fmt, samples-per-block from the
        # extra fmt bytes (cbSize then wSamplesPerBlock, both uint16)
        if n_channels != 1:
            raise NotImplementedError("only mono IMA-ADPCM WAV")
        spb = fmt[7] if len(fmt) >= 8 else (_align - 4) * 2 + 1
        return _decode_ima_adpcm(data, _align, int(spb)), int(sample_rate)
    if audio_format == 2:
        # MS-ADPCM: block-structured, per-block predictor pair + delta
        if n_channels != 1:
            raise NotImplementedError("only mono MS-ADPCM WAV")
        spb = fmt[7] if len(fmt) >= 8 else (_align - 7) * 2 + 2
        return _decode_ms_adpcm(data, _align, int(spb)), int(sample_rate)
    if audio_format in (6, 7):
        # G.711 A-law (6) / µ-law (7): one byte per sample
        x = _g711_decode(np.frombuffer(data, np.uint8), audio_format)
        if n_channels > 1:
            x = x[: (x.size // n_channels) * n_channels]
            x = x.reshape(-1, n_channels).mean(axis=1)
        return x, int(sample_rate)
    if audio_format != 1:
        raise NotImplementedError(
            "only PCM/IMA-ADPCM/MS-ADPCM/G.711 WAV "
            f"(got format tag {audio_format})"
        )
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"only 8/16-bit PCM (got {bits})")
    if n_channels > 1:
        x = x[: (x.size // n_channels) * n_channels]
        x = x.reshape(-1, n_channels).mean(axis=1)
    return x, int(sample_rate)


# MS-ADPCM (WAV format tag 2) — Microsoft's published block format:
# per-block predictor-pair index + adaptive delta, 4-bit signed nibbles
# against a two-tap linear predictor. Tables are the published constants.
_MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614,
     768, 614, 512, 409, 307, 230, 230, 230], dtype=np.int64
)
_MS_COEFS = ((256, 0), (512, -256), (0, 64), (192, 64),
             (240, 0), (460, -208), (392, -232))


def _decode_ms_adpcm(data: bytes, block_align: int, spb: int) -> np.ndarray:
    """Mono MS-ADPCM blocks → float64 in [-1, 1]. Per block: header =
    predictor index (1 B), initial delta (int16), sample1, sample2
    (int16 each, sample2 is the OLDER); then two nibbles per byte, high
    first."""
    import struct as _struct

    out: list[float] = []
    for off in range(0, len(data) - 6, block_align):
        blk = data[off:off + block_align]
        pred = blk[0]
        if pred >= len(_MS_COEFS):
            raise ValueError(f"MS-ADPCM predictor index {pred} out of range")
        c1, c2 = _MS_COEFS[pred]
        delta, s1, s2 = _struct.unpack_from("<hhh", blk, 1)
        samples = [s2, s1]
        for byte in blk[7:]:
            for nib in ((byte >> 4) & 0xF, byte & 0xF):
                signed = nib - 16 if nib & 0x8 else nib
                # the spec's C expression divides by 256 truncating
                # toward ZERO; >> 8 floors, drifting 1 low on negative
                # sums and feeding back through the s1/s2 recursion
                num = s1 * c1 + s2 * c2
                predicted = num // 256 if num >= 0 else -((-num) // 256)
                s = max(-32768, min(32767, predicted + signed * delta))
                s2, s1 = s1, s
                delta = max(16, (_MS_ADAPT[nib] * delta) >> 8)
                samples.append(s)
                if len(samples) >= spb:
                    break
            if len(samples) >= spb:
                break
        out.extend(samples[:spb])
    return np.asarray(out, dtype=np.float64) / 32768.0


def _encode_ms_adpcm_block(x16: np.ndarray, spb: int) -> bytes:
    """One mono MS-ADPCM block (predictor 0 = pure first-order; the
    decoder never assumes this choice)."""
    import struct as _struct

    c1, c2 = _MS_COEFS[0]
    s2 = int(x16[0]) if len(x16) > 0 else 0
    s1 = int(x16[1]) if len(x16) > 1 else 0
    # initial delta from the block's own first differences (what real
    # writers do): a fixed 128 saturates the 4-bit quantizer for the
    # first few samples of every block of steeper material (max step
    # 7*delta), injecting periodic transients. Mean |diff|/4 keeps the
    # codes in range while the adaptation table takes over; int16 field.
    if len(x16) > 2:
        diffs = np.abs(np.diff(x16[: min(len(x16), 64)]))
        delta = int(diffs.mean()) // 4
    else:
        delta = 128
    delta = max(16, min(32767, delta))
    out = bytearray()
    out += bytes([0]) + _struct.pack("<hhh", delta, s1, s2)
    nibbles: list[int] = []
    for i in range(2, spb):
        v = int(x16[i]) if i < len(x16) else 0
        num = s1 * c1 + s2 * c2  # truncate toward zero, like the decoder
        predicted = num // 256 if num >= 0 else -((-num) // 256)
        err = v - predicted
        code = max(-8, min(7, int(round(err / delta))))
        nib = code & 0xF
        s = max(-32768, min(32767, predicted + code * delta))
        s2, s1 = s1, s
        delta = max(16, int(_MS_ADAPT[nib] * delta) >> 8)
        nibbles.append(nib)
    if len(nibbles) % 2:
        nibbles.append(0)
    for a, b2 in zip(nibbles[0::2], nibbles[1::2]):
        out.append((a << 4) | b2)
    return bytes(out)


def encode_wav_ms_adpcm(
    samples: np.ndarray, sample_rate: int, block_align: int = 256
) -> bytes:
    """Minimal mono MS-ADPCM RIFF/WAVE writer (format tag 2) —
    decode_wav's test twin."""
    import struct as _struct

    x16 = np.clip(
        np.asarray(samples, dtype=np.float64) * 32768.0, -32768, 32767
    ).astype(np.int64)
    spb = (block_align - 7) * 2 + 2
    payload = bytearray()
    for off in range(0, len(x16), spb):
        payload += _encode_ms_adpcm_block(x16[off:off + spb], spb)
    # fmt extra: cbSize=4+7*4? minimal: wSamplesPerBlock + wNumCoef +
    # the 7 published coefficient pairs (what real writers emit)
    extra = _struct.pack("<HH", spb, len(_MS_COEFS))
    for a, b2 in _MS_COEFS:
        extra += _struct.pack("<hh", a, b2)
    fmt_chunk = _struct.pack(
        "<HHIIHHH", 2, 1, sample_rate,
        sample_rate * block_align // spb, block_align, 4, len(extra)
    ) + extra
    chunks = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + _struct.pack("<I", len(payload)) + bytes(payload)
    )
    return b"RIFF" + _struct.pack("<I", len(chunks) + 4) + chunks


# G.711 µ-law / A-law (WAV format tags 7 / 6) — the ITU-T G.711
# companding formulas computed directly (segment + mantissa expansion),
# no baked-in tables; telephony corpora are full of these.


def _g711_decode(codes: np.ndarray, fmt: int) -> np.ndarray:
    """Encoded bytes → mono float64 in [-1, 1]. µ-law: invert the
    8-bit compressed form of |x|+33 (bias) scaled by 2^segment; A-law:
    even-bit-inverted (0x55 XOR) segment/mantissa form."""
    c = codes.astype(np.int64)
    if fmt == 7:  # µ-law: stored complemented
        u = (~c) & 0xFF
        sign = np.where(u & 0x80, -1, 1)
        seg = (u >> 4) & 0x07
        man = u & 0x0F
        mag = (((man << 1) | 0x21) << seg) - 0x21
        return sign * mag / 8031.0  # µ-law decoded max (seg 7, man 15)
    if fmt == 6:  # A-law: even bits inverted on the wire
        a = c ^ 0x55
        sign = np.where(a & 0x80, -1, 1)
        seg = (a >> 4) & 0x07
        man = a & 0x0F
        mag = np.where(
            seg == 0,
            (man << 1) | 1,
            ((man << 1) | 0x21) << (seg - 1),
        )
        return sign * mag / 4032.0  # A-law decoded max (seg 7, man 15)
    raise ValueError(f"not a G.711 format tag: {fmt}")


def _g711_encode(x: np.ndarray, fmt: int) -> bytes:
    """Float samples in [-1, 1] → G.711 bytes — the test twin, built by
    searching the decode formula's segment structure rather than tables."""
    if fmt == 7:
        mag = np.clip(np.abs(x) * 8031.0, 0, 8031).astype(np.int64) + 0x21
        seg = (np.floor(np.log2(mag / 32.0)).astype(np.int64)).clip(0, 7)
        man = ((mag >> (seg + 1)) - 0x10) & 0x0F
        u = (np.where(np.asarray(x) < 0, 0x80, 0x00) | (seg << 4) | man)
        return bytes(((~u) & 0xFF).astype(np.uint8))
    if fmt == 6:
        mag = np.clip(np.abs(x) * 4032.0, 0, 4095).astype(np.int64)
        seg = np.where(
            mag < 32, 0,
            (np.floor(np.log2(np.maximum(mag, 32) / 16.0))).astype(np.int64)
        ).clip(0, 7)
        man = np.where(seg == 0, mag >> 1, (mag >> seg) & 0x0F)
        a = (np.where(np.asarray(x) < 0, 0x80, 0x00) | (seg << 4) | man)
        return bytes((a ^ 0x55).astype(np.uint8))
    raise ValueError(f"not a G.711 format tag: {fmt}")


def encode_wav_g711(samples: np.ndarray, sample_rate: int, fmt: int = 7) -> bytes:
    """Minimal mono G.711 RIFF/WAVE writer (format tag 7 µ-law / 6
    A-law) — decode_wav's test twin for telephony payloads."""
    import struct

    payload = _g711_encode(np.asarray(samples, dtype=np.float64), fmt)
    fmt_chunk = struct.pack("<HHIIHH", fmt, 1, sample_rate, sample_rate, 1, 8)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks) - 4) + chunks


# IMA ADPCM (WAV format tag 17) — published DVI/IMA tables and nibble
# rule; 4 bits/sample lossy codec, block-structured (predictor+index
# header per block). Decoder is the real path; encoder is its test twin.
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)


def _ima_step_decode(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA nibble → (new predictor, new index), per the spec rule."""
    step = int(_IMA_STEP[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX[nibble])))
    return pred, index


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """Minimal mono IMA-ADPCM RIFF/WAVE writer (format tag 17) — the
    spec-valid fixture twin of the decoder. ``samples`` are floats in
    [-1, 1]; each block carries (samples_per_block) samples: one 16-bit
    header sample + samples_per_block-1 nibbles (odd nibble counts pad
    with zero nibbles, as real encoders do)."""
    import struct

    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (x * 32767.0).round().astype(np.int64)
    spb = samples_per_block
    nib_per_block = spb - 1
    block_align = 4 + (nib_per_block + 1) // 2
    blocks = []
    index = 0
    for b0 in range(0, len(pcm), spb):
        chunk = pcm[b0 : b0 + spb]
        pred = int(chunk[0])
        hdr = struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(_IMA_STEP[index])
            delta = int(s) - pred
            n = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            pred, index = _ima_step_decode(n, pred, index)
            nibbles.append(n)
        while len(nibbles) < nib_per_block:
            nibbles.append(0)
            # keep codec state in sync with the padding nibbles the
            # decoder will also consume
            pred, index = _ima_step_decode(0, pred, index)
        packed = bytearray()
        for lo, hi in zip(nibbles[0::2], nibbles[1::2] + [0][: len(nibbles) % 2]):
            packed.append((hi << 4) | lo)
        blocks.append(hdr + bytes(packed))
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH",
        17, 1, sample_rate,
        sample_rate * block_align // spb or 1,
        block_align, 4, 2, spb,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_ima_adpcm(data: bytes, block_align: int, spb: int) -> np.ndarray:
    """Mono IMA-ADPCM data chunk → float64 samples in [-1, 1]."""
    import struct

    out = []
    for b0 in range(0, len(data) - 3, block_align):
        block = data[b0 : b0 + block_align]
        pred, index, _ = struct.unpack_from("<hBB", block)
        index = max(0, min(88, index))
        out.append(pred)
        produced = 1
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):
                if produced >= spb:
                    break
                pred, index = _ima_step_decode(nib, pred, index)
                out.append(pred)
                produced += 1
    return np.asarray(out, dtype=np.float64) / 32768.0


def audio_feature_vector(samples: np.ndarray, sample_rate: int) -> dict:
    """Deterministic DSP features over mono samples: duration, RMS,
    zero-crossing rate (fraction of sign flips), spectral centroid from
    the rfft magnitude spectrum."""
    n = samples.size
    if n == 0:
        return {
            "n_samples": 0,
            "duration_s": 0.0,
            "rms": 0.0,
            "zero_crossing_rate": 0.0,
            "spectral_centroid_hz": 0.0,
        }
    rms = float(np.sqrt(np.mean(samples**2)))
    signs = np.signbit(samples)
    zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) / max(n - 1, 1)
    mag = np.abs(np.fft.rfft(samples))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    total = float(mag.sum())
    centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
    return {
        "n_samples": int(n),
        "duration_s": round(n / sample_rate, 6),
        "rms": round(rms, 6),
        "zero_crossing_rate": round(zcr, 6),
        "spectral_centroid_hz": round(centroid, 3),
    }


def attach_wav_media(
    df: DataFrame, id_col: str = "doc_id", codec: str = "pcm"
) -> DataFrame:
    """Deterministic VALID WAV payloads derived from the id: 0.25 s at
    8 kHz of a sine at 200 + (id % 20)·50 Hz plus a quieter second
    harmonic — the audio twin of attach_ppm_media; features recovered
    by decode_audio_features pin the frequency analytically.
    ``codec="mixed"`` routes by id — PCM, IMA-ADPCM (format tag 17),
    G.711 µ-law (7), A-law (6) and MS-ADPCM (2) — so the decode stage
    exercises real per-payload codec routing across all five WAV
    codecs."""
    if codec not in ("pcm", "mixed"):
        raise ValueError("codec must be 'pcm' or 'mixed'")

    @F.pandas_udf(BinaryType())
    def make_wav(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            f0 = 200.0 + (int(i) % 20) * 50.0
            t = np.arange(2000) / 8000.0
            x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.1 * np.sin(2 * np.pi * 2 * f0 * t)
            sel = int(i) % 5 if codec == "mixed" else 0
            if sel == 1:
                out.append(encode_wav_adpcm(x, 8000))
            elif sel == 2:
                out.append(encode_wav_g711(x, 8000, fmt=7))
            elif sel == 3:
                out.append(encode_wav_g711(x, 8000, fmt=6))
            elif sel == 4:
                out.append(encode_wav_ms_adpcm(x, 8000))
            else:
                out.append(encode_wav(x, 8000))
        return pd.Series(out)

    k = F.col(id_col)
    payload = make_wav(k.cast("long"))
    return df.withColumn(
        "media",
        F.struct(
            F.concat(F.lit("s3://media/audio_"), k, F.lit(".wav")).alias("uri"),
            F.lit("audio/wav").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            payload.alias("payload"),
        ),
    )


def decode_audio_features(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Decode + DSP-feature stage over a WAV media column via mapInPandas
    — Arrow batches in/out, payload bytes never row-by-row through the
    driver. Same batch/partitioning shape as decode_image_features; swap
    a real codec library into the same iterator for compressed audio."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, m in zip(pdf[id_col], pdf[media_col]):
                if m is None or m["payload"] is None:
                    continue  # null media: skip, never TypeError the stage
                samples, sr = decode_wav(bytes(m["payload"]))
                feats = audio_feature_vector(samples, sr)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "uri": m["uri"],
                        "sample_rate": sr,
                        **feats,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return df.select(id_col, media_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


# --------------------------------------------------------------------------
# Video (uncompressed AVI) — the video half of X5. AVI is RIFF like WAV:
# LIST 'hdrl' (avih + strl/strf headers) and LIST 'movi' whose '00db'
# chunks each hold one uncompressed DIB frame (bottom-up, BGR, 4-byte
# row padding — the same pixel layout decode_bmp handles). That makes
# frame extraction REAL with stdlib struct + numpy; compressed fourccs
# raise, the documented env-blocked boundary (no ffmpeg here).
# --------------------------------------------------------------------------

VIDEO_FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("uri", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("n_frames", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def encode_avi(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """Minimal uncompressed-AVI writer (RGB24 '00db' DIB frames) — the
    fixture twin of decode_avi_frames."""
    import struct

    h, w, _ = frames[0].shape
    row_bytes = (w * 3 + 3) & ~3
    frame_size = row_bytes * h

    def dib(img: np.ndarray) -> bytes:
        bgr = img[::-1, :, ::-1]  # top-down RGB → bottom-up BGR
        padded = np.zeros((h, row_bytes), dtype=np.uint8)
        padded[:, : w * 3] = bgr.reshape(h, w * 3)
        return padded.tobytes()

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_size * fps, 0, 0, len(frames), 0, 1, frame_size,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames), frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return ctype + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


_MJPG = int.from_bytes(b"MJPG", "little")


def decode_avi_frames(b: bytes, every_n: int = 1) -> tuple[list[tuple[int, np.ndarray]], int]:
    """AVI → ([(frame_idx, (h, w, 3) RGB uint8)], n_frames), sampling
    every ``every_n``-th frame. Stdlib struct RIFF walk. Two real
    stream kinds: uncompressed 24-bit DIB ('00db') and Motion-JPEG
    ('00dc' with the MJPG fourcc — each frame is a baseline JPEG, fed
    to our own decoder). Other compressed fourccs raise
    NotImplementedError."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = None
    mode = "dib"
    frames_raw: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal w, h, mode
        pos = start
        while pos + 8 <= end:
            ctype = b[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", b, pos + 4)
            data_start = pos + 8
            if ctype == b"LIST":
                walk(data_start + 4, data_start + ln)  # skip list kind
            elif ctype == b"strf" and ln >= 40:
                _sz, bw, bh, _planes, bpp, comp = struct.unpack_from("<IiiHHI", b, data_start)
                if comp == _MJPG:
                    mode = "mjpg"
                elif bpp != 24 or comp != 0:
                    raise NotImplementedError(
                        f"only uncompressed-24-bit or MJPG AVI "
                        f"(got {bpp} bpp, compression {comp})"
                    )
                w, h = bw, abs(bh)
            elif ctype == b"00dc" and ln > 0:
                if mode != "mjpg":
                    raise NotImplementedError(
                        "compressed AVI stream (00dc) with non-MJPG fourcc"
                    )
                frames_raw.append(b[data_start : data_start + ln])
            elif ctype == b"00db":
                frames_raw.append(b[data_start : data_start + ln])
            pos = data_start + ln + (ln & 1)

    walk(12, len(b))
    if w is None or h is None:
        raise ValueError("AVI missing strf header")
    out = []
    if mode == "mjpg":
        from .jpeg import decode_jpeg

        for idx in range(0, len(frames_raw), every_n):
            out.append((idx, decode_jpeg(frames_raw[idx])))
        return out, len(frames_raw)
    row_bytes = (w * 3 + 3) & ~3
    for idx in range(0, len(frames_raw), every_n):
        raw = np.frombuffer(frames_raw[idx], dtype=np.uint8, count=row_bytes * h)
        img = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        out.append((idx, img[::-1, :, ::-1].copy()))  # bottom-up BGR → top-down RGB
    return out, len(frames_raw)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 25, quant: int = 8) -> bytes:
    """Motion-JPEG AVI writer (MJPG fourcc, each frame a baseline JPEG
    from operators/jpeg.py) — the compressed-video fixture twin."""
    import struct

    from .jpeg import encode_jpeg

    h, w, _ = frames[0].shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return tag + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) & 1 else b"")

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, _MJPG, 0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", encode_jpeg(f, quant=quant)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def attach_avi_media(df: DataFrame, id_col: str = "doc_id", n_frames: int = 6) -> DataFrame:
    """Deterministic VALID uncompressed-AVI payloads: ``n_frames`` 4×4
    frames whose pixels derive from md5(id, frame_idx) — the video twin
    of attach_ppm_media."""
    import hashlib

    @F.pandas_udf(BinaryType())
    def make_avi(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            frames = []
            for f in range(n_frames):
                hx = hashlib.md5(f"{int(i)}:{f}".encode()).hexdigest()
                frames.append(np.frombuffer(bytes.fromhex(hx * 3), np.uint8).reshape(4, 4, 3))
            out.append(encode_avi(frames))
        return pd.Series(out)

    k = F.col(id_col)
    payload = make_avi(k.cast("long"))
    return df.withColumn(
        "media",
        F.struct(
            F.concat(F.lit("s3://media/vid_"), k, F.lit(".avi")).alias("uri"),
            F.lit("video/x-msvideo").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            payload.alias("payload"),
        ),
    )


def decode_video_frame_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    every_n: int = 2,
    feature_dim: int = 8,
) -> DataFrame:
    """Real frame-sample + per-frame feature stage over an AVI media
    column via mapInPandas (one output row per sampled frame — the
    explode happens inside the Arrow batch, so payload bytes ship to
    Python exactly once per video, not once per frame)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, m in zip(pdf[id_col], pdf[media_col]):
                if m is None or m["payload"] is None:
                    continue  # null media: skip, never TypeError the stage
                sampled, n_total = decode_avi_frames(bytes(m["payload"]), every_n)
                for idx, img in sampled:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "uri": m["uri"],
                            "frame_idx": idx,
                            "n_frames": n_total,
                            "width": img.shape[1],
                            "height": img.shape[0],
                            "feature": image_feature_vector(img, feature_dim),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return df.select(id_col, media_col).mapInPandas(run, VIDEO_FRAME_FEATURES_SCHEMA)


def attach_jpeg_media(
    df: DataFrame, id_col: str = "doc_id", subsample: bool = False
) -> DataFrame:
    """Deterministic VALID baseline-JPEG payloads: an 8×8 smooth ramp
    whose base color derives from md5(id), compressed by our own T.81
    encoder (operators/jpeg.py) — the compressed-format twin of
    attach_ppm_media; `decode_image_features(fake=False)` really
    Huffman-decodes + IDCTs these."""
    import hashlib

    from .jpeg import encode_jpeg

    @F.pandas_udf(BinaryType())
    def make_jpeg(ids: pd.Series) -> pd.Series:
        from .jpeg import encode_jpeg_progressive

        out = []
        yy, xx = np.mgrid[0:8, 0:8]
        for i in ids:
            d = hashlib.md5(str(int(i)).encode()).digest()
            base = np.frombuffer(d[:3], np.uint8).astype(np.float64)
            img = np.clip(
                base[None, None, :] + yy[:, :, None] * 4 + xx[:, :, None] * 2,
                0, 255,
            ).astype(np.uint8)
            if int(i) % 3 == 1 and not subsample:
                # every 3rd id ships PROGRESSIVE (SOF2) — the registry
                # corpus exercises the Annex G decode path for real
                out.append(encode_jpeg_progressive(img, quant=4))
            elif int(i) % 3 == 2 and not subsample:
                # and every other 3rd LOSSLESS (SOF3, Annex H)
                from .jpeg import encode_jpeg_lossless

                out.append(encode_jpeg_lossless(img))
            else:
                out.append(encode_jpeg(img, quant=4, subsample=subsample))
        return pd.Series(out)

    k = F.col(id_col)
    payload = make_jpeg(k.cast("long"))
    return df.withColumn(
        "media",
        F.struct(
            F.concat(F.lit("s3://media/img_"), k, F.lit(".jpg")).alias("uri"),
            F.lit("image/jpeg").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            payload.alias("payload"),
        ),
    )


def repartition_media_by_bytes(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    target_bytes: int = 64 * 1024 * 1024,
    salt_buckets: int = 64,
    unpersist_after: bool = True,
) -> DataFrame:
    """Even out decode tasks before a heavy mapInPandas stage: decode
    cost scales with payload BYTES, not rows, so row-count-balanced
    partitions give skewed tasks when payload sizes vary (one 4K video
    next to a thousand thumbnails). Greedy byte-packing (the
    sampling.pack_shards cumsum, salted into ``salt_buckets`` parallel
    packing lanes so the prefix-sum window never serializes through one
    task) assigns each row a shard of ~``target_bytes``, then a RANGE
    repartition on (lane, shard) gives each task contiguous whole
    shards. Guarantee: every (lane, shard) group carries <= target +
    one payload; tasks hold ~1 group each (range boundaries come from
    sampling, so a task may occasionally carry a couple of adjacent
    groups — bounded slack, unlike hash collisions which pile up
    unboundedly). Lanes are deterministic (xxhash64 of the id).

    Cache lifetime: the planning count below is an eager job, so the
    input is persisted first (otherwise the payload-producing lineage
    runs twice). With ``unpersist_after=True`` (default) the cache is
    dropped before returning — repeated calls in a long session never
    accumulate cached media payloads in executor storage, at the cost
    of one upstream recompute when the result is consumed. Pass
    ``unpersist_after=False`` to keep the cache hot for consumption;
    the caller then owns the lifetime and releases it with
    :func:`release_media_cache` on the returned frame."""
    from .sampling import pack_shards

    lane = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets)).cast("int")
    # persist BEFORE the planning action: the byte-sum below is an
    # eager job, and without the persist it would recompute the whole
    # upstream lineage (payload-producing UDFs, binaryFile scans) a
    # second time when the repartitioned result is consumed
    with_lane = df.withColumn("_lane", lane).persist()
    packed = pack_shards(
        with_lane,
        id_col,
        F.col(f"{media_col}.n_bytes"),
        target_bytes,
        partition_col="_lane",
    )
    # count (lane, shard) GROUPS, not plain bytes/target: per-lane
    # rounding adds up to one shard per lane, and range partitions
    # should hold ~1 group each for the byte-balance guarantee
    n = packed.select(
        F.count_distinct(F.col("_lane"), F.col("shard_id")).alias("n")
    ).first()["n"]
    out = (
        packed.repartitionByRange(
            max(int(n or 1), 1), F.col("_lane"), F.col("shard_id")
        )
        .drop("_lane", "shard_id")
    )
    if unpersist_after:
        with_lane.unpersist(blocking=False)
    else:
        out._hielo_media_cache = with_lane  # released via release_media_cache
    return out


def release_media_cache(df: DataFrame) -> None:
    """Release the cache held by ``repartition_media_by_bytes(...,
    unpersist_after=False)`` once the result has been materialized."""
    cached = getattr(df, "_hielo_media_cache", None)
    if cached is not None:
        cached.unpersist(blocking=False)
