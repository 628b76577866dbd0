"""X5 — multimodal (image/audio/video) column plumbing (SURVEY §2.8).

Media lives in DataFrames as an opaque ``binary`` payload plus a typed
metadata struct — the same shape ``spark.read.format('binaryFile')``
produces, and what an Iceberg table with a binary column stores:

    media: struct<uri: string, mime: string, n_bytes: long, payload: binary>

Decode / feature-extract stages run as ``mapInPandas`` stages: Arrow
batches in, Arrow batches out, so payload bytes never pass through Python
row-by-row. The actual codec calls are STUBBED (no PIL/ffmpeg in this
environment): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder produces
metadata-derived features — the Spark-side plumbing (schemas, batching,
partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    feature_dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract stage over a media column via mapInPandas.

    Real deployments replace ``_fake_decode`` with PIL/torchvision inside
    the same iterator — the batch shape, schema, and partitioning are
    identical. With ``fake=False`` this raises NotImplementedError at
    execution time (codec libraries are not available here).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv; run with fake=True for "
                    "the deterministic stand-in decoder"
                )
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
