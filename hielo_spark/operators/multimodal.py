"""X5 — multimodal (image/audio/video) column plumbing (SURVEY §2.8).

Media lives in DataFrames as an opaque ``binary`` payload plus a typed
metadata struct — the same shape ``spark.read.format('binaryFile')``
produces, and what an Iceberg table with a binary column stores:

    media: struct<uri: string, mime: string, n_bytes: long, payload: binary>

Decode / feature-extract stages run as ``mapInPandas`` stages: Arrow
batches in, Arrow batches out, so payload bytes never pass through Python
row-by-row. Codec status (r3): **uncompressed formats decode for real**
— PPM (P6) and 24-bit uncompressed BMP are parsed with numpy alone, and
nearest-neighbor resize is numpy index striding. Compressed formats
(JPEG/PNG/video) still raise NotImplementedError (no PIL/ffmpeg in this
environment) unless ``fake=True`` selects the deterministic stand-in —
the Spark-side plumbing (schemas, batching, partitioning) is identical
on every path.
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


def decode_image(b: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from an uncompressed payload; compressed formats
    raise NotImplementedError (PIL/ffmpeg are not in this environment)."""
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    raise NotImplementedError(
        "only PPM(P6)/uncompressed-BMP decode natively; JPEG/PNG need PIL "
        "(absent here) — use fake=True for the deterministic stand-in"
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
                img = decode_image(bytes(m["payload"]))
                ids.append(int(doc_id))
                uris.append(m["uri"])
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                feats.append(image_feature_vector(img, feature_dim))
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
