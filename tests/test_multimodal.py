"""X5 multimodal plumbing: media struct schema, mapInPandas decode stage
(fake deterministic decoder), frame-sample explode, and the stub guard."""

from __future__ import annotations

import pytest

from hielo_spark.io import load_table
from hielo_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return MM.attach_fake_media(load_table(spark, sf_dir, "documents").select("doc_id").limit(50))


def test_media_struct_schema(media):
    names = [fld.name for fld in media.schema["media"].dataType.fields]
    assert names == ["uri", "mime", "n_bytes", "payload"]
    row = media.first()
    assert row["media"]["mime"] == "image/png"
    assert row["media"]["n_bytes"] == len(row["media"]["payload"])


def test_decode_features_deterministic(media):
    out1 = {r["doc_id"]: r.asDict() for r in MM.decode_image_features(media, fake=True).collect()}
    out2 = {r["doc_id"]: r.asDict() for r in MM.decode_image_features(media, fake=True).collect()}
    assert len(out1) == 50
    sample = next(iter(out1.values()))
    assert len(sample["feature"]) == 8
    assert all(0.0 <= x <= 1.0 for x in sample["feature"])
    assert out1.keys() == out2.keys()
    assert all(out1[k]["feature"] == out2[k]["feature"] for k in out1)


def test_decode_without_codec_raises(media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as ei:
        MM.decode_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "image decode requires" in str(ei.value)


def test_frame_sample_plan(media):
    frames = MM.frame_sample_plan(media, every_n=10)
    # payload is 136 bytes → n_frames = 1 → one frame (idx 0) per row
    assert frames.count() == 50
    assert frames.select("frame_idx").distinct().collect()[0][0] == 0


def _ppm_bytes(w, h, pixels):
    """P6 PPM from a row-major [(r,g,b), ...] list."""
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + bytes(v for px in pixels for v in px)


def _bmp_bytes(w, h, pixels):
    """Uncompressed 24-bit BMP (bottom-up, BGR, 4-byte row padding)."""
    import struct

    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    data_offset = 14 + 40
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", data_offset + img_size, 0, 0, data_offset)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    for r in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for c in range(w):
            rr, gg, bb = pixels[r * w + c]
            row += bytes((bb, gg, rr))  # BGR
        row += b"\x00" * (row_bytes - len(row))
        out += row
    return bytes(out)


def test_ppm_and_bmp_decode_agree():
    """The same 2×2 image through both codecs decodes identically."""
    import numpy as np

    from hielo_spark.operators.multimodal import decode_bmp, decode_ppm

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    a = decode_ppm(_ppm_bytes(2, 2, px))
    b = decode_bmp(_bmp_bytes(2, 2, px))
    assert a.shape == b.shape == (2, 2, 3)
    assert np.array_equal(a, b)
    assert tuple(a[0, 0]) == (255, 0, 0) and tuple(a[1, 1]) == (10, 20, 30)


def test_resize_nearest():
    import numpy as np

    from hielo_spark.operators.multimodal import decode_ppm, resize_nearest

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    img = decode_ppm(_ppm_bytes(2, 2, px))
    up = resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    # each source pixel becomes a 2×2 block
    assert np.array_equal(up[:2, :2], np.broadcast_to(img[0, 0], (2, 2, 3)))
    assert np.array_equal(up[2:, 2:], np.broadcast_to(img[1, 1], (2, 2, 3)))


def test_real_decode_through_spark_stage(spark):
    """decode_image_features with fake=False over real PPM payloads: exact
    widths/heights and feature values (uniform red image: mean_r=1, std=0,
    brightness=1/3)."""
    import pyspark.sql.functions as F

    from hielo_spark.operators.multimodal import decode_image_features

    red = _ppm_bytes(3, 2, [(255, 0, 0)] * 6)
    grad = _ppm_bytes(2, 2, [(0, 0, 0), (255, 255, 255), (0, 0, 0), (255, 255, 255)])
    rows = [(1, ("u1", "image/x-portable-pixmap", len(red), bytearray(red))),
            (2, ("u2", "image/x-portable-pixmap", len(grad), bytearray(grad)))]
    from hielo_spark.operators.multimodal import MEDIA_STRUCT
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("doc_id", LongType()), StructField("media", MEDIA_STRUCT)])
    df = spark.createDataFrame(rows, schema)
    got = {r.doc_id: r for r in decode_image_features(df).collect()}
    assert (got[1].width, got[1].height) == (3, 2)
    assert (got[2].width, got[2].height) == (2, 2)
    f1 = got[1].feature
    assert f1[0] == 1.0 and f1[1] == 0.0 and f1[2] == 0.0  # channel means
    assert f1[3] == f1[4] == f1[5] == 0.0                  # stds: uniform
    assert f1[6] == 1.5                                    # aspect 3/2
    assert abs(f1[7] - 1 / 3) < 1e-6                       # brightness
    f2 = got[2].feature
    assert f2[0] == f2[1] == f2[2] == 0.5 and f2[3] == 0.5


def test_compressed_payload_still_raises(spark):
    import pytest as _pytest

    from hielo_spark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_attach_ppm_media_real_decode(spark, sf_dir):
    """The JVM-expression-built P6 payloads decode for real: 4×4 images,
    deterministic md5-derived pixel features, no fake path."""
    d = load_table(spark, sf_dir, "documents").select("doc_id").limit(20)
    out = {r.doc_id: r for r in MM.decode_image_features(
        MM.attach_ppm_media(d), fake=False).collect()}
    assert len(out) == 20
    assert all((r.width, r.height) == (4, 4) for r in out.values())
    # deterministic across runs
    again = {r.doc_id: r.feature for r in MM.decode_image_features(
        MM.attach_ppm_media(d), fake=False).collect()}
    assert all(out[k].feature == again[k] for k in out)
