"""X5 multimodal plumbing: media struct schema, mapInPandas decode stage
(fake deterministic decoder), frame-sample explode, and the stub guard."""

from __future__ import annotations

import numpy as np
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


def test_stub_boundary_raises(spark):
    """r4 moved baseline JPEG to the real path, r7 progressive; the
    remaining stub boundary is arithmetic-coded JPEG and unknown
    formats. Malformed payloads of known formats are data errors, not
    missing-codec errors."""
    import struct as _struct

    import pytest as _pytest

    from hielo_spark.operators.multimodal import decode_image

    # truncated/malformed JPEG: data error now that baseline decodes
    with _pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0....JFIF....")
    # arithmetic-coded JPEG (SOF9): explicit NotImplementedError
    sof9 = (b"\xff\xd8\xff\xc9"
            + _struct.pack(">HBHHB", 11, 8, 1, 1, 1) + bytes([1, 0x11, 0]))
    with _pytest.raises(NotImplementedError):
        decode_image(sof9)
    with _pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with _pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")  # WebP: still a stub


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


def test_png_roundtrip_all_filter_types():
    """decode_png must invert encode_png for every PNG filter type
    (None/Sub/Up/Average/Paeth) on the same pixel data — the filter
    reconstruction arithmetic is the spec's, exercised row by row."""
    import numpy as np

    from hielo_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for ft in range(5):
        got = decode_png(encode_png(img, filter_type=ft))
        assert got.shape == (7, 5, 3)
        assert (got == img).all(), f"filter {ft} round-trip mismatch"


def test_png_cross_codec_agreement():
    """The same image via PPM and PNG must decode to identical pixels and
    identical feature vectors (VERDICT r3 item 6's 'done' bar)."""
    import numpy as np

    from hielo_spark.operators.multimodal import (
        decode_image,
        encode_png,
        image_feature_vector,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    ppm = b"P6\n4 4\n255\n" + img.tobytes()
    png = encode_png(img, filter_type=4)
    a, b = decode_image(ppm), decode_image(png)
    assert (a == b).all()
    assert image_feature_vector(a) == image_feature_vector(b)


def test_png_gray_and_rgba_normalize_to_rgb():
    """Gray expands to 3 identical channels; RGBA drops alpha."""
    import struct
    import zlib

    import numpy as np

    from hielo_spark.operators.multimodal import PNG_SIGNATURE, decode_png

    def png_raw(w, h, color, channels, pixel_bytes):
        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        rows = b"".join(b"\x00" + pixel_bytes[y * w * channels:(y + 1) * w * channels]
                        for y in range(h))
        return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))

    gray = decode_png(png_raw(2, 2, 0, 1, bytes([10, 20, 30, 40])))
    assert gray.shape == (2, 2, 3) and (gray[0, 0] == [10, 10, 10]).all()

    rgba = decode_png(png_raw(1, 1, 6, 4, bytes([1, 2, 3, 128])))
    assert rgba.shape == (1, 1, 3) and (rgba[0, 0] == [1, 2, 3]).all()


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    import pytest

    from hielo_spark.operators.multimodal import PNG_SIGNATURE, decode_png

    def png_hdr(depth=8, color=2, interlace=0):
        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, interlace)
        return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
                + chunk(b"IEND", b""))

    # 16-bit, Adam7 AND sub-byte depths are SUPPORTED since r7 (tests
    # above); an invalid depth refuses loudly, a sub-byte depth on an
    # RGB color type is illegal, truncated payloads fail on size
    with pytest.raises(ValueError, match="invalid PNG bit depth"):
        decode_png(png_hdr(depth=3))
    with pytest.raises(ValueError, match="only legal for gray/palette"):
        decode_png(png_hdr(depth=4, color=2))
    with pytest.raises(ValueError, match="wrong size"):
        decode_png(png_hdr(depth=16))  # 1x1 16-bit RGB needs 7 bytes
    # palette (color type 3) is SUPPORTED since r5 — but only with a
    # PLTE chunk; a bare color-3 payload fails loudly, never silently
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(png_hdr(color=3))
    with pytest.raises(NotImplementedError, match="color type"):
        decode_png(png_hdr(color=5))


def test_registry_query_decodes_all_codec_payloads(spark, sf_dir):
    """The registry query routes ids across the three real codecs (PPM /
    zlib PNG / baseline JPEG by id mod 3); every row decodes with real
    features — 4×4 for PPM/PNG, 8×8 for the JPEG ramps."""
    from hielo_spark.queries import QUERIES

    rows = QUERIES["multimodal_image_features"](spark, sf_dir).collect()
    assert rows
    by_uri = {r.uri: r for r in rows}
    assert any(u.endswith(".png") for u in by_uri)
    assert any(u.endswith(".ppm") for u in by_uri)
    assert any(u.endswith(".jpg") for u in by_uri)
    for r in rows:
        expected = (8, 8) if r.uri.endswith(".jpg") else (4, 4)
        assert (r.width, r.height) == expected
        assert len(r.feature) == 8 and any(v != 0.0 for v in r.feature)


# ---------------------------------------------------------------- audio/WAV


def test_wav_roundtrip_16bit():
    sr = 8000
    t = np.arange(1600) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, got_sr = MM.decode_wav(MM.encode_wav(x, sr))
    assert got_sr == sr
    # int16 quantization error only
    assert np.abs(samples - x).max() < 1.0 / 32000


def test_wav_8bit_and_word_alignment():
    sr = 4000
    x = np.linspace(-1, 1, 101)  # odd-length data chunk exercises padding
    samples, got_sr = MM.decode_wav(MM.encode_wav(x, sr, bits=8))
    assert got_sr == sr
    assert samples.size == 101
    # 8-bit PCM: ±1/256 rounding plus the standard 127-encode/128-decode
    # full-scale asymmetry ⇒ worst case ≈ 0.0118
    assert np.abs(samples - x).max() < 0.012


def test_wav_stereo_downmixes_to_mono_mean():
    import struct

    sr = 8000
    left = np.full(100, 0.5)
    right = np.full(100, -0.5)
    inter = np.empty(200)
    inter[0::2], inter[1::2] = left, right
    pcm = (np.clip(inter, -1, 1) * 32767).round().astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, _ = MM.decode_wav(wav)
    assert samples.size == 100
    assert np.abs(samples).max() < 1e-4  # L/R cancel in the mono mean


def test_audio_features_analytic_sine_pins():
    sr, f, amp = 8000, 440.0, 0.6
    t = np.arange(4000) / sr
    samples, _ = MM.decode_wav(MM.encode_wav(amp * np.sin(2 * np.pi * f * t), sr))
    feats = MM.audio_feature_vector(samples, sr)
    assert abs(feats["rms"] - amp / np.sqrt(2)) < 1e-3
    assert abs(feats["zero_crossing_rate"] - 2 * f / sr) < 0.005
    assert abs(feats["spectral_centroid_hz"] - f) < 10.0
    assert feats["duration_s"] == 0.5


def test_wav_non_pcm_raises():
    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float tag
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        MM.decode_wav(wav)


def test_audio_features_through_spark_stage(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    out = MM.decode_audio_features(MM.attach_wav_media(df)).toPandas()
    assert len(out) == 40
    assert set(out.columns) == {
        "doc_id", "uri", "sample_rate", "n_samples", "duration_s",
        "rms", "zero_crossing_rate", "spectral_centroid_hz",
    }
    # the generator frequency is 200 + (id % 20)*50; the centroid sits
    # between f0 and 2*f0 (harmonic at 1/5 amplitude pulls it up a bit)
    for _, r in out.iterrows():
        f0 = 200.0 + (int(r.doc_id) % 20) * 50.0
        assert f0 * 0.95 < r.spectral_centroid_hz < f0 * 1.4, (r.doc_id, r.spectral_centroid_hz)
        assert r.sample_rate == 8000
        assert r.n_samples == 2000
    # deterministic: same ids → identical features across runs
    out2 = MM.decode_audio_features(MM.attach_wav_media(df)).toPandas()
    pdtesting = out.sort_values("doc_id").reset_index(drop=True)
    assert pdtesting.equals(out2.sort_values("doc_id").reset_index(drop=True))


def test_registry_audio_query_runs(spark, sf_dir):
    from hielo_spark.queries import QUERIES

    out = QUERIES["multimodal_audio_features"](spark, sf_dir)
    pdf = out.limit(10).toPandas()
    assert (pdf["rms"] > 0.3).all()  # 0.5-amp sine + harmonic ⇒ rms ≈ 0.36


# ---------------------------------------------------------------- video/AVI


def test_avi_roundtrip_exact():
    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, (5, 3, 3), dtype=np.uint8) for _ in range(4)]
    got, n = MM.decode_avi_frames(MM.encode_avi(frames))
    assert n == 4 and len(got) == 4
    for (idx, img), orig in zip(got, frames):
        assert img.shape == (5, 3, 3)
        assert np.array_equal(img, orig)  # lossless: uncompressed DIB


def test_avi_frame_sampling_every_n():
    frames = [np.full((4, 4, 3), i * 10, dtype=np.uint8) for i in range(10)]
    got, n = MM.decode_avi_frames(MM.encode_avi(frames), every_n=3)
    assert n == 10
    assert [idx for idx, _ in got] == [0, 3, 6, 9]
    assert all(int(img[0, 0, 0]) == idx * 10 for idx, img in got)


def test_avi_odd_width_row_padding():
    # width 3 → 9-byte rows padded to 12: exercises the DIB stride logic
    frames = [np.arange(45, dtype=np.uint8).reshape(5, 3, 3)]
    got, _ = MM.decode_avi_frames(MM.encode_avi(frames))
    assert np.array_equal(got[0][1], frames[0])


def test_avi_compressed_raises():
    import struct

    avi = MM.encode_avi([np.zeros((2, 2, 3), dtype=np.uint8)])
    # flip the strf compression field (offset: find strf chunk)
    i = avi.index(b"strf")
    comp_off = i + 8 + 16  # strf data + (size, w, h, planes, bpp) = 16 bytes
    broken = avi[:comp_off] + struct.pack("<I", 1) + avi[comp_off + 4 :]
    with pytest.raises(NotImplementedError):
        MM.decode_avi_frames(broken)


def test_video_features_through_spark_stage(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    out = MM.decode_video_frame_features(
        MM.attach_avi_media(df, n_frames=6), every_n=2
    ).toPandas()
    # 10 videos × frames {0, 2, 4}
    assert len(out) == 30
    assert set(out.frame_idx) == {0, 2, 4}
    assert (out.n_frames == 6).all()
    assert (out.width == 4).all() and (out.height == 4).all()
    # per-frame pixels derive from md5(id, frame_idx): features must be
    # deterministic and distinct across frames of the same video
    g = out[out.doc_id == 0].sort_values("frame_idx")
    feats = [tuple(f) for f in g.feature]
    assert len(set(feats)) == 3
    out2 = MM.decode_video_frame_features(
        MM.attach_avi_media(df, n_frames=6), every_n=2
    ).toPandas()
    a = out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_repartition_media_by_bytes_bounds_task_bytes(spark):
    import pyspark.sql.functions as F

    # skewed payloads: ids 0-3 get ~100 KB, the rest ~1 KB
    df = spark.range(0, 64).withColumnRenamed("id", "doc_id")
    big = F.when(F.col("doc_id") < 4, 100_000).otherwise(1_000)
    payload = F.expr("repeat('x', 10)")  # content irrelevant; n_bytes drives packing
    media = df.withColumn(
        "media",
        F.struct(
            F.concat(F.lit("u"), F.col("doc_id")).alias("uri"),
            F.lit("application/octet-stream").alias("mime"),
            big.cast("long").alias("n_bytes"),
            F.encode(payload, "utf-8").alias("payload"),
        ),
    )
    out = MM.repartition_media_by_bytes(
        media, target_bytes=100_000, salt_buckets=8
    )
    assert out.count() == 64  # no rows lost
    assert set(out.columns) == {"doc_id", "media"}
    # the operator guarantee: every (lane, shard) packing group carries
    # at most target + one boundary-crossing payload...
    from hielo_spark.operators.sampling import pack_shards

    lane = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(8)).cast("int")
    groups = (
        pack_shards(media.withColumn("_lane", lane), "doc_id",
                    F.col("media.n_bytes"), 100_000, partition_col="_lane")
        .groupBy("_lane", "shard_id")
        .agg(F.sum("media.n_bytes").alias("bytes"))
        .collect()
    )
    assert max(r.bytes for r in groups) <= 100_000 + 100_000
    # ...and range partitioning keeps per-task load within a small
    # multiple of target (no unbounded hash pile-up)
    sizes = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum("media.n_bytes").alias("bytes"))
        .collect()
    )
    assert max(r.bytes for r in sizes) <= 3 * (100_000 + 100_000)


# -- IMA ADPCM (format tag 17) ---------------------------------------------


def test_ima_adpcm_hand_pinned_nibbles():
    """Spec rule by hand: predictor 0 / index 0 / nibbles [1, 1] →
    step 7 gives diff (7>>3)+(7>>2)=1 twice → samples 0, 1, 2."""
    import struct

    from hielo_spark.operators.multimodal import _decode_ima_adpcm

    block = struct.pack("<hBB", 0, 0, 0) + bytes([0x11])  # two nibbles: 1, 1
    out = _decode_ima_adpcm(block, block_align=5, spb=3)
    assert [round(v * 32768) for v in out] == [0, 1, 2]


def test_ima_adpcm_roundtrip_snr():
    """Encoder twin → decoder: 4-bit ADPCM on a 440 Hz sine must keep a
    healthy SNR (lossy, but far above noise) and exact length."""
    import numpy as np

    from hielo_spark.operators.multimodal import decode_wav, encode_wav_adpcm

    sr = 8000
    t = np.arange(sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    wav = encode_wav_adpcm(x, sr)
    y, rate = decode_wav(wav)
    assert rate == sr
    y = y[: x.size]
    err = x - y
    snr_db = 10 * np.log10((x**2).mean() / max((err**2).mean(), 1e-12))
    assert snr_db > 20, snr_db


def test_ima_adpcm_features_match_pcm_twin():
    """The same sine through PCM and ADPCM paths: RMS and zero-crossing
    agree tightly, and the FFT's dominant bin stays at 440 Hz (the
    magnitude-weighted centroid is NOT compared — 4-bit quantization
    noise is broadband and legitimately shifts that metric)."""
    import numpy as np

    from hielo_spark.operators.multimodal import (
        audio_feature_vector,
        decode_wav,
        encode_wav,
        encode_wav_adpcm,
    )

    sr = 8000
    t = np.arange(sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    f_pcm = audio_feature_vector(*decode_wav(encode_wav(x, sr)))
    y, rate = decode_wav(encode_wav_adpcm(x, sr))
    f_adp = audio_feature_vector(y[: x.size], rate)
    assert abs(f_pcm["rms"] - f_adp["rms"]) / f_pcm["rms"] < 0.02
    assert f_pcm["zero_crossing_rate"] == f_adp["zero_crossing_rate"]
    peak_hz = np.fft.rfftfreq(x.size, d=1.0 / sr)[
        int(np.abs(np.fft.rfft(y[: x.size])).argmax())
    ]
    assert abs(peak_hz - 440.0) < 2.0


def test_mjpg_avi_roundtrip_and_sampling():
    """Motion-JPEG AVI: each 00dc frame is a baseline JPEG decoded by
    our own codec; every-n sampling and frame count intact; smooth
    frames reconstruct within JPEG tolerance."""
    import numpy as np

    from hielo_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi_mjpeg,
    )

    frames = []
    for k in range(4):
        y, x = np.mgrid[0:16, 0:16]
        img = np.stack(
            [(x * 16 + k * 7) % 256, (y * 16) % 256, ((x + y) * 8) % 256],
            axis=-1,
        ).astype(np.uint8)
        frames.append(img)
    avi = encode_avi_mjpeg(frames, quant=4)
    got, n = decode_avi_frames(avi)
    assert n == 4 and [i for i, _ in got] == [0, 1, 2, 3]
    for (_, dec), orig in zip(got, frames):
        assert dec.shape == orig.shape
        err = np.abs(dec.astype(int) - orig.astype(int)).mean()
        assert err < 12, err  # JPEG-lossy but close

    sampled, n2 = decode_avi_frames(avi, every_n=2)
    assert n2 == 4 and [i for i, _ in sampled] == [0, 2]


def test_non_mjpg_compressed_avi_still_raises():
    import struct

    import pytest as _pytest

    from hielo_spark.operators.multimodal import decode_avi_frames, encode_avi_mjpeg
    import numpy as np

    avi = bytearray(encode_avi_mjpeg([np.zeros((8, 8, 3), np.uint8)]))
    # flip the strf fourcc to XVID: the 00dc chunk must now refuse
    i = bytes(avi).find(b"MJPG", 50)  # strf copy (strh holds the first)
    avi[i : i + 4] = b"XVID"
    i2 = bytes(avi).find(b"MJPG")
    avi[i2 : i2 + 4] = b"XVID"
    with _pytest.raises(NotImplementedError, match="MJPG AVI"):
        decode_avi_frames(bytes(avi))


def test_audio_decode_routes_mixed_codecs(spark):
    """A mixed five-codec corpus (PCM, IMA-ADPCM, G.711 µ/A-law,
    MS-ADPCM) decodes through ONE stage; the analytical frequency pin
    holds for every codec."""
    import numpy as np

    from hielo_spark.operators import multimodal as MM

    d = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    feats = {r.doc_id: r for r in MM.decode_audio_features(
        MM.attach_wav_media(d, codec="mixed")).collect()}
    for i in range(10):
        f0 = 200.0 + (i % 20) * 50.0
        # zero-crossing rate recovers the fundamental for EVERY codec
        # (2·f0/sr sign flips per sample; robust to ADPCM's broadband
        # noise, unlike the magnitude-weighted centroid)
        assert abs(feats[i].zero_crossing_rate - 2 * f0 / 8000.0) < 0.01, (
            i, feats[i].zero_crossing_rate, f0)
        assert abs(feats[i].rms - np.sqrt(0.5**2 / 2 + 0.1**2 / 2)) < 0.02
        if i % 5 in (0, 2, 3):  # PCM/G.711 rows keep the centroid pin
            assert abs(feats[i].spectral_centroid_hz - f0) < f0 * 0.6


def test_null_payload_rows_skipped_not_crashed(spark):
    """MEDIA_STRUCT declares payload nullable: a null payload row must
    skip cleanly in every decode stage, not TypeError the whole job."""
    import pyspark.sql.functions as F

    from hielo_spark.operators import multimodal as MM

    d = spark.range(0, 4).withColumnRenamed("id", "doc_id")
    media = MM.attach_ppm_media(d).withColumn(
        "media",
        F.when(
            F.col("doc_id") % 2 == 0, F.col("media")
        ).otherwise(
            F.struct(
                F.col("media.uri").alias("uri"),
                F.col("media.mime").alias("mime"),
                F.col("media.n_bytes").alias("n_bytes"),
                F.lit(None).cast("binary").alias("payload"),
            )
        ),
    )
    out = MM.decode_image_features(media, fake=False).collect()
    assert {r.doc_id for r in out} == {0, 2}  # null rows skipped


def test_palette_png_cross_codec_agreement():
    """The same pixels via truecolor PNG and palette PNG (r5 PLTE path)
    must decode identically and yield identical feature vectors — the
    VERDICT r4 item-5 'done' bar."""
    import numpy as np

    from hielo_spark.operators.multimodal import (
        decode_image,
        encode_png,
        encode_png_palette,
        image_feature_vector,
    )

    rng = np.random.default_rng(11)
    # 6 distinct colors tiled -> well under the 256-entry palette cap
    colors = rng.integers(0, 256, size=(6, 3), dtype=np.uint8)
    idx = rng.integers(0, 6, size=(8, 8))
    img = colors[idx]
    truecolor = encode_png(img, filter_type=2)
    palette = encode_png_palette(img)
    a, b = decode_image(truecolor), decode_image(palette)
    assert (a == img).all() and (b == img).all()
    assert image_feature_vector(a) == image_feature_vector(b)


def test_palette_png_validation():
    import numpy as np
    import pytest as _pytest

    from hielo_spark.operators.multimodal import (
        decode_png,
        encode_png_palette,
    )

    # >256 distinct colors refuse to encode (not a quantizer)
    rng = np.random.default_rng(3)
    big = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    with _pytest.raises(ValueError, match="palette max 256"):
        encode_png_palette(big)
    # palette payload with the PLTE chunk stripped fails loudly
    small = big[:4, :4]
    small = (small // 64) * 64  # few colors
    from hielo_spark.operators.multimodal import PNG_SIGNATURE
    import struct, zlib

    payload = encode_png_palette(small)
    # remove the PLTE chunk
    pos, out = 8, bytearray(PNG_SIGNATURE)
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if ctype != b"PLTE":
            out += payload[pos : pos + 12 + ln]
        pos += 12 + ln
    with _pytest.raises(ValueError, match="PLTE"):
        decode_png(bytes(out))


def test_registry_corpus_contains_palette_payloads(spark):
    """attach_png_media now mixes palette PNGs in: the decode stage must
    route both forms and agree with the PPM twin's pixels."""
    import numpy as np

    from hielo_spark.operators import multimodal as MM

    df = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    feats = MM.decode_image_features(MM.attach_png_media(df), fake=False)
    ppm_feats = MM.decode_image_features(MM.attach_ppm_media(df), fake=False)
    a = {r.doc_id: r for r in feats.collect()}
    b = {r.doc_id: r for r in ppm_feats.collect()}
    assert set(a) == set(b) == set(range(8))
    for k in a:
        assert list(a[k].feature) == list(b[k].feature)
        assert (a[k].width, a[k].height) == (b[k].width, b[k].height)
    # and the payloads for ids 3 and 7 really are color-type-3 PNGs
    rows = MM.attach_png_media(df).select("doc_id", "media.payload").collect()
    for r in rows:
        color_type = r.payload[8 + 8 + 9]  # IHDR data byte 9 = color type
        assert color_type == (3 if r.doc_id % 4 == 3 else 2)


# -- 16-bit + Adam7 PNG (r7) --------------------------------------------------


def _png_chunks(ihdr_fields, idat_payload, plte=None):
    import struct
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    out += chunk(b"IDAT", zlib.compress(idat_payload)) + chunk(b"IEND", b"")
    return out


def test_png_16bit_decodes_high_byte():
    """16-bit samples are big-endian; filters run on BYTES with bpp
    doubled; the decoder keeps the high byte (spec 16→8 downsample)."""
    import numpy as np

    from hielo_spark.operators.multimodal import decode_png

    # 2x2 16-bit RGB, filter 0 rows, values chosen so high/low bytes
    # differ (a low-byte mixup would be loud)
    px = np.array(
        [[[0x1234, 0x5678, 0x9ABC], [0xFF01, 0x0001, 0x8000]],
         [[0x0000, 0xFFFF, 0x7F80], [0x4040, 0x2020, 0x1010]]],
        dtype=np.uint16,
    )
    payload = b""
    for y in range(2):
        payload += b"\x00" + px[y].astype(">u2").tobytes()
    b = _png_chunks((2, 2, 16, 2, 0, 0, 0), payload)
    got = decode_png(b)
    assert got.dtype == np.uint8 and got.shape == (2, 2, 3)
    assert (got == (px >> 8).astype(np.uint8)).all()

    # 16-bit GRAY with the Up filter (byte-wise across the 2-byte bpp)
    g = np.array([[0x0102, 0x0304], [0x0506, 0x0708]], dtype=np.uint16)
    row0 = g[0].astype(">u2").tobytes()
    row1_filt = bytes(
        (b1 - b0) & 0xFF
        for b0, b1 in zip(row0, g[1].astype(">u2").tobytes())
    )
    b2 = _png_chunks((2, 2, 16, 0, 0, 0, 0),
                     b"\x00" + row0 + b"\x02" + row1_filt)
    got2 = decode_png(b2)
    assert (got2[:, :, 0] == (g >> 8).astype(np.uint8)).all()


def test_png_adam7_matches_sequential():
    """An Adam7-interlaced PNG decodes to the same pixels as the
    sequential encoding of the same image — pass geometry built in-test
    straight from the spec's origin/stride table."""
    import numpy as np

    from hielo_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(10, 9, 3), dtype=np.uint8)

    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    payload = b""
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            payload += b"\x00" + sub[y].tobytes()  # filter 0 rows
    b = _png_chunks((img.shape[1], img.shape[0], 8, 2, 0, 0, 1), payload)
    got = decode_png(b)
    assert (got == img).all()
    # and equals the round trip through our own sequential encoder
    assert (decode_png(encode_png(img)) == img).all()


def test_png_16bit_adam7_combined():
    import numpy as np

    from hielo_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(11)
    img16 = rng.integers(0, 65536, size=(5, 6, 3), dtype=np.uint16)
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    payload = b""
    for x0, y0, dx, dy in passes:
        sub = img16[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            payload += b"\x00" + sub[y].astype(">u2").tobytes()
    b = _png_chunks((6, 5, 16, 2, 0, 0, 1), payload)
    got = decode_png(b)
    assert (got == (img16 >> 8).astype(np.uint8)).all()


def test_png_illegal_combinations_rejected():
    import pytest as _pytest

    from hielo_spark.operators.multimodal import decode_png

    b = _png_chunks((4, 4, 4, 0, 0, 0, 0), b"\x00\x00\x00")  # bad size
    with _pytest.raises(ValueError, match="wrong size"):
        decode_png(b)
    with _pytest.raises(ValueError, match="not a legal combination"):
        decode_png(_png_chunks((2, 2, 16, 3, 0, 0, 0), b"\x00\x00",
                               plte=b"\x00\x00\x00"))


# -- sub-byte PNG (r7: depths 1/2/4, gray + palette) --------------------------


def test_png_subbyte_gray_roundtrip_and_scaling():
    """4/2/1-bit gray PNGs decode through the encoder twin with the
    spec's exact full-range scaling (17/85/255 factors), including a
    width that leaves pad bits in the last packed byte."""
    import numpy as np

    from hielo_spark.operators.multimodal import (
        decode_png,
        encode_png_subbyte,
    )

    rng = np.random.default_rng(3)
    for depth, scale in ((4, 17), (2, 85), (1, 255)):
        # width 5: 4-bit rows pack to 3 bytes (4 pad bits), 2-bit to 2
        # bytes, 1-bit to 1 byte — pad handling is exercised every time
        s = rng.integers(0, 1 << depth, size=(4, 5), dtype=np.uint8)
        got = decode_png(encode_png_subbyte(s, depth))
        assert got.shape == (4, 5, 3)
        assert (got[:, :, 0] == s * scale).all(), depth
        assert (got[:, :, 0] == got[:, :, 1]).all()


def test_png_subbyte_filters_run_on_packed_bytes():
    """Sub/Up filters on sub-byte rows operate on the PACKED bytes with
    bpp=1 — the encoder twin forward-filters the same way."""
    import numpy as np

    from hielo_spark.operators.multimodal import (
        decode_png,
        encode_png_subbyte,
    )

    rng = np.random.default_rng(5)
    s = rng.integers(0, 16, size=(6, 11), dtype=np.uint8)
    for ft in (1, 2):
        got = decode_png(encode_png_subbyte(s, 4, filter_type=ft))
        assert (got[:, :, 0] == s * 17).all(), ft


def test_png_subbyte_palette():
    """2-bit palette PNG: packed indices into a 4-entry PLTE."""
    import numpy as np

    from hielo_spark.operators.multimodal import (
        decode_png,
        encode_png_subbyte,
    )

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 3]], dtype=np.uint8)
    b = encode_png_subbyte(idx, 2, color=3, plte=palette.tobytes())
    got = decode_png(b)
    assert (got == palette[idx]).all()
    # an index past the PLTE still fails loudly
    import pytest as _pytest

    short = encode_png_subbyte(idx, 2, color=3, plte=palette[:3].tobytes())
    with _pytest.raises(ValueError, match="PLTE range"):
        decode_png(short)


def test_png_subbyte_adam7_matches_sequential():
    """Adam7-interlaced sub-byte PNG: each pass packs its OWN rows
    (pass stride = ceil(pw·depth/8)) — decodes to the same pixels as
    the sequential encoding."""
    import struct
    import zlib

    import numpy as np

    from hielo_spark.operators.multimodal import (
        decode_png,
        encode_png_subbyte,
    )

    rng = np.random.default_rng(9)
    s = rng.integers(0, 16, size=(10, 9), dtype=np.uint8)
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    payload = b""
    for x0, y0, dx, dy in passes:
        sub = s[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            bits = ((sub[y][:, None] >> np.arange(3, -1, -1)) & 1)
            payload += b"\x00" + np.packbits(bits.reshape(-1)).tobytes()
    b = _png_chunks((9, 10, 4, 0, 0, 0, 1), payload)
    got = decode_png(b)
    assert (got[:, :, 0] == s * 17).all()
    seq = decode_png(encode_png_subbyte(s, 4))
    assert (got == seq).all()


# -- G.711 µ-law / A-law WAV (r7) ---------------------------------------------


def test_g711_reference_points_and_roundtrip():
    """ITU-T G.711 companding: spec-pinned code points (µ-law silence
    0xFF, full-scale 0x80; A-law wire inversion 0x55) plus round-trip
    SNR on a sine — telephony-grade (> 30 dB at 0.6 FS)."""
    import numpy as np

    from hielo_spark.operators.multimodal import (
        _g711_decode,
        _g711_encode,
        decode_wav,
        encode_wav_g711,
    )

    assert _g711_decode(np.array([0xFF], np.uint8), 7)[0] == 0.0
    assert abs(_g711_decode(np.array([0x80], np.uint8), 7)[0] - 1.0) < 1e-9
    assert abs(_g711_decode(np.array([0xAA], np.uint8), 6)[0] + 1.0) < 1e-9
    assert abs(_g711_decode(np.array([0x55], np.uint8), 6)[0]) < 0.001

    t = np.arange(8000) / 8000.0
    x = 0.6 * np.sin(2 * np.pi * 440 * t)
    for fmt in (7, 6):
        y = _g711_decode(np.frombuffer(_g711_encode(x, fmt), np.uint8), fmt)
        snr = 10 * np.log10((x ** 2).mean() / ((x - y) ** 2).mean())
        assert snr > 30, (fmt, snr)
        wav = encode_wav_g711(x, 8000, fmt=fmt)
        z, sr = decode_wav(wav)
        assert sr == 8000 and len(z) == len(x)
        assert np.corrcoef(x, z)[0, 1] > 0.999


def test_g711_exact_requantization():
    """decode(encode(decode(c))) must reproduce every code's level
    exactly — the companding segments are self-consistent."""
    import numpy as np

    from hielo_spark.operators.multimodal import _g711_decode, _g711_encode

    codes = np.arange(256, dtype=np.uint8)
    for fmt in (7, 6):
        levels = _g711_decode(codes, fmt)
        back = _g711_decode(
            np.frombuffer(_g711_encode(levels, fmt), np.uint8), fmt
        )
        assert np.allclose(levels, back, atol=1e-12), fmt


def test_unknown_wav_format_still_rejected():
    import struct

    import pytest as _pytest

    from hielo_spark.operators.multimodal import decode_wav

    fmt_chunk = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 0)  # MP3
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt_chunk
           + b"data" + struct.pack("<I", 2) + b"\x00\x00")
    with _pytest.raises(NotImplementedError, match="format tag 85"):
        decode_wav(wav)


def test_ms_adpcm_wav_roundtrip():
    """MS-ADPCM (format tag 2): published adaptation table + coefficient
    pairs; the fixed-predictor encoder twin round-trips a two-tone sine
    above 20 dB SNR and the decoder honors per-block headers."""
    import numpy as np

    from hielo_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ms_adpcm,
    )

    t = np.arange(4000) / 8000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * np.sin(2 * np.pi * 880 * t))
    y, sr = decode_wav(encode_wav_ms_adpcm(x, 8000))
    assert sr == 8000 and len(y) == len(x)
    snr = 10 * np.log10((x ** 2).mean() / ((x - y) ** 2).mean())
    assert snr > 20, snr
    # an out-of-range predictor index fails loudly, not garbage audio
    import pytest as _pytest

    bad = bytearray(encode_wav_ms_adpcm(x[:500], 8000))
    data_at = bytes(bad).index(b"data") + 8
    bad[data_at] = 9  # predictor index beyond the 7 published pairs
    with _pytest.raises(ValueError, match="predictor index"):
        decode_wav(bytes(bad))


def test_ms_adpcm_negative_predictor_truncates_toward_zero():
    """The spec's C expression divides the two-tap predictor sum by 256
    truncating toward ZERO; a floor shift (>>8) lands 1 low on negative
    sums and the error feeds back through the s1/s2 recursion. Pin a
    hand-built block whose first predictor sum is -320: trunc gives -1,
    floor would give -2."""
    import struct

    import numpy as np

    from hielo_spark.operators.multimodal import _decode_ms_adpcm

    # predictor 2 = (c1=0, c2=64); header samples s1=7, s2=-5; one data
    # byte of two zero nibbles. First decode step: predicted =
    # 7*0 + (-5)*64 = -320 -> trunc(-320/256) = -1 (floor: -2).
    # Second step: s1=-1, s2=7 -> 7*64 = 448 -> 1 either way.
    blk = bytes([2]) + struct.pack("<hhh", 16, 7, -5) + b"\x00"
    out = _decode_ms_adpcm(blk, block_align=8, spb=4)
    np.testing.assert_array_equal(
        np.round(out * 32768.0).astype(int), [-5, 7, -1, 1]
    )


def test_ms_adpcm_block_start_transients_bounded():
    """The encoder twin derives each block's initial delta from the
    block's own first differences — a fixed delta=128 saturated the
    4-bit quantizer on steep material, injecting ~0.19-amplitude
    transients at samples 3-5 of EVERY block (periodic clicks across
    the fixture corpus)."""
    import numpy as np

    from hielo_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ms_adpcm,
    )

    t = np.arange(4000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 700 * t)  # slope ~5600 int16/sample
    y, _ = decode_wav(encode_wav_ms_adpcm(x, 8000))
    assert np.abs(y[: len(x)] - x).max() < 0.06
