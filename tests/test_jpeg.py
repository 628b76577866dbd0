"""Baseline JPEG codec (operators/jpeg.py): spec pins that don't trust the
encoder/decoder pair to share bugs — the zigzag sequence and DCT scaling
are asserted against published constants, round-trips run at several
shapes/sampling modes, and the decoder is exercised on streams whose
tables it must parse from the bytes (it never sees the encoder's Python
table objects)."""

from __future__ import annotations

import numpy as np
import pytest

from hielo_spark.operators import jpeg as J

PUBLISHED_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_published_sequence():
    assert list(J.ZIGZAG) == PUBLISHED_ZIGZAG


def test_dct_analytic_pins():
    # constant block: only DC, with orthonormal scaling DC = 8 * value
    blk = np.full((8, 8), 100.0)
    F = J._A @ blk @ J._A.T
    assert abs(F[0, 0] - 800.0) < 1e-9
    assert np.abs(F).sum() - abs(F[0, 0]) < 1e-9
    # orthonormality: A @ A.T = I, so IDCT inverts DCT exactly
    assert np.allclose(J._A @ J._A.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 8))
    assert np.allclose(J._A.T @ (J._A @ x @ J._A.T) @ J._A, x, atol=1e-12)


def test_extend_receive_spec_examples():
    # spec F.2.2.1: size-3 raw values 0..3 are negatives -7..-4, 4..7 positive
    assert [J._extend(v, 3) for v in range(8)] == [-7, -6, -5, -4, 4, 5, 6, 7]
    assert J._extend(0, 0) == 0
    assert J._extend(1, 1) == 1 and J._extend(0, 1) == -1


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (17, 23), (32, 24)])
def test_roundtrip_444(shape):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quant=4))
    assert dec.shape == img.shape
    # flat quant 4 ⇒ error bounded by quant + color-transform rounding
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 24
    assert np.abs(dec.astype(float) - img.astype(float)).mean() < 4.0


def test_roundtrip_420_smooth():
    # chroma subsampling is near-lossless on smooth images — this isolates
    # 4:2:0 MCU/plane geometry bugs from legitimate subsampling loss
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(yy * 3 + 20) % 256, (xx * 2 + 80) % 256, ((xx + yy) * 2 + 40) % 256],
        axis=-1,
    ).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quant=4, subsample=True))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_solid_color_near_exact():
    img = np.full((24, 24, 3), (200, 50, 90), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quant=8))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_restart_intervals():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    plain = J.decode_jpeg(J.encode_jpeg(img, quant=8))
    rst = J.decode_jpeg(J.encode_jpeg(img, quant=8, restart_interval=3))
    # restart markers change the byte stream but not the pixels
    assert np.array_equal(plain, rst)


def test_grayscale_single_component():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quant=4, gray=True))
    assert dec.shape == (16, 16, 3)
    # all three output channels equal the luma plane
    assert np.array_equal(dec[..., 0], dec[..., 1])
    assert np.array_equal(dec[..., 1], dec[..., 2])
    y = J._rgb_to_ycbcr(img)[..., 0]
    assert np.abs(dec[..., 0].astype(float) - y).max() <= 8


def test_byte_stuffing_roundtrip():
    # bright uniform blocks drive the entropy stream toward 0xFF runs;
    # decode proves unstuffing. Verify stuffed pairs actually occur.
    img = np.full((16, 16, 3), 255, dtype=np.uint8)
    enc = J.encode_jpeg(img, quant=8)
    dec = J.decode_jpeg(enc)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_unsupported_modes_and_bad_streams_raise():
    import struct

    # progressive (SOF2) and lossless (SOF3) are SUPPORTED since r7;
    # arithmetic coding (SOF9) and hierarchical (SOF5) still refuse
    for sof in (0xC9, 0xC5):
        payload = struct.pack(">HBHHB", 11, 8, 1, 1, 1) + bytes(3)
        with pytest.raises(NotImplementedError, match="arithmetic"):
            J.decode_jpeg(b"\xff\xd8" + bytes([0xFF, sof]) + payload[0:2]
                          + payload[2:])
    with pytest.raises(ValueError):
        J.decode_jpeg(b"NOTAJPEG")
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    # a progressive stream with no scans at all is malformed
    sof2 = (b"\xff\xd8\xff\xc2" + struct.pack(">HBHHB", 11, 8, 1, 1, 1)
            + bytes([1, 0x11, 0]) + b"\xff\xd9")
    with pytest.raises(ValueError, match="no scans"):
        J.decode_jpeg(sof2)


def test_cross_codec_agreement_with_png():
    """The same image through PNG (lossless) and JPEG (quant=1, 4:4:4)
    must decode to nearly identical pixels — ties the JPEG path to the
    independently-tested PNG path rather than only to its own encoder."""
    from hielo_spark.operators.multimodal import decode_image, encode_png

    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack(
        [(yy * 5 + 10) % 256, (xx * 7 + 60) % 256, ((xx * 3 + yy * 2)) % 256],
        axis=-1,
    ).astype(np.uint8)
    via_png = decode_image(encode_png(img))
    via_jpeg = decode_image(J.encode_jpeg(img, quant=1))
    assert np.array_equal(via_png, img)
    assert np.abs(via_jpeg.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_through_spark_stage(spark, sf_dir):
    from hielo_spark.io import load_table
    from hielo_spark.operators import multimodal as MM

    d = load_table(spark, sf_dir, "documents").select("doc_id").limit(20)
    out = {r.doc_id: r for r in MM.decode_image_features(
        MM.attach_jpeg_media(d), fake=False).collect()}
    assert len(out) == 20
    assert all((r.width, r.height) == (8, 8) for r in out.values())
    again = {r.doc_id: r.feature for r in MM.decode_image_features(
        MM.attach_jpeg_media(d), fake=False).collect()}
    assert all(out[k].feature == again[k] for k in out)
    # features differ across ids (base color is md5-derived)
    assert len({tuple(r.feature) for r in out.values()}) > 10


def test_truncated_scan_data_is_a_value_error():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    enc = J.encode_jpeg(img, quant=8)
    # chop the entropy-coded data well before EOI
    sos = enc.index(b"\xff\xda")
    truncated = enc[: sos + 40] + b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated or corrupt"):
        J.decode_jpeg(truncated)


# -- progressive (SOF2, r7) ---------------------------------------------------


def test_progressive_decode_matches_baseline_bitexact():
    """The same image through the progressive scan script (DC first at
    Al=1 → DC refine → per-component AC first at Al=1 → AC refine) must
    decode BIT-IDENTICALLY to the baseline encoding — the coefficients
    are the same, only the scan structure differs, so any progressive
    decode bug (EOB runs, correction bits, point transforms) shows as a
    pixel diff."""
    yy, xx = np.mgrid[0:21, 0:19]
    img = np.stack(
        [(yy * 6 + 20) % 256, (xx * 9 + 60) % 256, ((xx + yy) * 4) % 256],
        axis=-1,
    ).astype(np.uint8)
    for quant in (2, 4, 12):
        d_prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quant=quant))
        d_base = J.decode_jpeg(J.encode_jpeg(img, quant=quant))
        assert (d_prog == d_base).all(), f"quant={quant}"


def test_progressive_spectral_selection_bands():
    """Splitting the AC band across several scans (spectral selection)
    exercises per-band EOB runs; the result must not change."""
    yy, xx = np.mgrid[0:17, 0:23]
    img = np.stack(
        [(yy * 6 + 20) % 256, (xx * 9 + 60) % 256, ((xx + yy) * 4) % 256],
        axis=-1,
    ).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(img, quant=4))
    for bands in (((1, 63),), ((1, 5), (6, 20), (21, 63)), ((1, 1), (2, 63))):
        prog = J.decode_jpeg(
            J.encode_jpeg_progressive(img, quant=4, bands=bands))
        assert (prog == base).all(), bands


def test_progressive_noise_and_gray_and_flat():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert (J.decode_jpeg(J.encode_jpeg_progressive(noise, quant=2))
            == J.decode_jpeg(J.encode_jpeg(noise, quant=2))).all()
    # flat image: every AC scan is one long EOB run
    flat = np.full((24, 24, 3), 137, dtype=np.uint8)
    assert (J.decode_jpeg(J.encode_jpeg_progressive(flat, quant=8))
            == J.decode_jpeg(J.encode_jpeg(flat, quant=8))).all()
    # grayscale single-component frame
    g = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    assert (J.decode_jpeg(J.encode_jpeg_progressive(g, quant=4, gray=True))
            == J.decode_jpeg(J.encode_jpeg(g, quant=4, gray=True))).all()


def test_progressive_negative_dc_refinement():
    """Dark images give negative DC coefficients — the refinement bit
    must compose with two's-complement OR on negatives."""
    img = np.full((16, 16, 3), 3, dtype=np.uint8)  # DC ≈ (3-128)*8 < 0
    img[4:8, 4:8] = 9
    assert (J.decode_jpeg(J.encode_jpeg_progressive(img, quant=3))
            == J.decode_jpeg(J.encode_jpeg(img, quant=3))).all()


# -- lossless (SOF3, r7) -------------------------------------------------------


def test_lossless_exact_roundtrip_all_predictors():
    """Lossless JPEG is EXACT: every Annex H predictor round-trips
    random 8-bit gray and RGB pixel-for-pixel."""
    rng = np.random.default_rng(13)
    g = rng.integers(0, 256, size=(12, 11), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(9, 14, 3), dtype=np.uint8)
    for sel in range(1, 8):
        got = J.decode_jpeg(J.encode_jpeg_lossless(g, predictor=sel))
        assert (got[:, :, 0] == g).all(), sel
        assert (got[:, :, 0] == got[:, :, 1]).all()
        got3 = J.decode_jpeg(J.encode_jpeg_lossless(rgb, predictor=sel))
        assert (got3 == rgb).all(), sel


def test_lossless_point_transform_and_restarts():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(8, 10), dtype=np.uint8)
    # pt=2 drops two low bits: decode returns (v>>2)<<2
    got = J.decode_jpeg(J.encode_jpeg_lossless(img, pt=2))
    assert (got[:, :, 0] == (img >> 2) << 2).all()
    # restart markers reset prediction; round trip stays exact
    got2 = J.decode_jpeg(J.encode_jpeg_lossless(img, restart_interval=10))
    assert (got2[:, :, 0] == img).all()


def test_lossless_16bit_precision_and_ssss16():
    """16-bit lossless: differences span the full modulo-2^16 window —
    including the SSSS=16 (+32768, no extra bits) special case — and
    the decoder maps the high byte into the uint8 contract."""
    img = np.array([[0, 32768, 65535, 1]], dtype=np.int64)
    b = J.encode_jpeg_lossless(img, predictor=1, precision=16)
    got = J.decode_jpeg(b)
    assert (got[0, :, 0] == (img[0] >> 8)).all()
    rng = np.random.default_rng(19)
    big = rng.integers(0, 65536, size=(6, 7), dtype=np.int64)
    assert (J.decode_jpeg(
        J.encode_jpeg_lossless(big, precision=16))[:, :, 0]
        == (big >> 8)).all()


def test_lossless_rejects_bad_inputs():
    img = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        J.decode_jpeg(J.encode_jpeg_lossless(img, predictor=0))
    with pytest.raises(ValueError, match="out of range"):
        J.encode_jpeg_lossless(np.full((2, 2), 300), precision=8)
