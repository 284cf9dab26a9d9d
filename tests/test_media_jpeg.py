"""Baseline JPEG codec (kernels/media.py, written from ITU-T T.81).

Three layers of evidence:

1. Exact lossy-pipeline roundtrips: with UNIT quantization tables an
   image that is constant within each aligned 8x8 block has only a DC
   coefficient per block (an exact integer), so encode -> decode
   reproduces every pixel bit-for-bit — covering markers, canonical
   Huffman DC coding, byte stuffing, RSTn restarts and edge padding.
2. Entropy-coding losslessness on RANDOM images: the decoded pixels
   must equal an independent per-block reconstruction
   IDCT(round(DCT(img)/q) * q) computed directly in the test — any
   mis-coded AC coefficient (runs, ZRL, EOB, EXTEND) breaks equality.
3. Color paths: the exact expectation composes the rounded JFIF
   YCbCr<->RGB transforms; 4:2:0 fixtures are constant per 16x16 MCU
   so chroma downsampling is exact too.

Reference parity: GDAL reads the same baseline streams via libjpeg
(frmts/jpeg/jpgdataset.cpp); this codec is spec-written like the TIFF
(kernels/tiff.py) and PNG codecs.
"""

import numpy as np
import pytest

from gdal_spark.kernels import media as km


def _block_gray(h, w, seed=7):
    bR, bC = np.mgrid[0:h, 0:w]
    return (((bR // 8) * 13 + (bC // 8) * 3 + seed) % 256).astype(np.uint8)


def _expect_gray(img, q):
    """Independent reconstruction: IDCT(round(DCT/q)*q), bypassing the
    bitstream entirely."""
    p = km._plane_blocks(img)
    nby, nbx = p.shape[:2]
    zz = km._fdct_quant(p.reshape(-1, 8, 8), q)
    nat = np.zeros_like(zz)
    nat[:, km._ZIGZAG] = zz
    s = (nat * q[None, :]).astype(np.float64).reshape(-1, 8, 8)
    blk = np.einsum("xu,nuv,yv->nxy", km._DCT_T.T, s, km._DCT_T.T) + 128.0
    plane = (blk.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
             .reshape(nby * 8, nbx * 8))
    return np.clip(np.round(plane), 0, 255).astype(
        np.uint8)[:img.shape[0], :img.shape[1]]


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (13, 21), (40, 33), (9, 9)])
def test_gray_block_constant_exact(h, w):
    img = _block_gray(h, w)
    out = km.decode_jpeg(km.encode_jpeg(img))
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("ri", [1, 2, 3, 7])
def test_restart_markers_exact(ri):
    img = _block_gray(32, 40)
    payload = km.encode_jpeg(img, restart_interval=ri)
    assert b"\xFF\xDD" in payload          # DRI present
    np.testing.assert_array_equal(km.decode_jpeg(payload), img)


def test_color_444_block_constant_exact():
    rr, cc, ch = np.mgrid[0:16, 0:24, 0:3]
    img = (((rr // 8) * 13 + (cc // 8) * 3 + ch * 11 + 5) % 256).astype(
        np.uint8)
    y, cb, cr = km._rgb_to_ycbcr(img)
    expected = km._ycbcr_to_rgb(y, cb, cr)
    out = km.decode_jpeg(km.encode_jpeg(img, subsampling="444"))
    np.testing.assert_array_equal(out, expected)


def test_color_420_mcu_constant_exact():
    rr, cc, ch = np.mgrid[0:32, 0:48, 0:3]
    img = (((rr // 16) * 13 + (cc // 16) * 3 + ch * 11 + 5) % 256).astype(
        np.uint8)
    y, cb, cr = km._rgb_to_ycbcr(img)
    expected = km._ycbcr_to_rgb(y, cb, cr)
    out = km.decode_jpeg(km.encode_jpeg(img, subsampling="420"))
    np.testing.assert_array_equal(out, expected)


@pytest.mark.parametrize("q", [None, 90, 50, 10])
def test_random_gray_entropy_lossless(q):
    rng = np.random.RandomState(42 if q is None else q)
    img = rng.randint(0, 256, (37, 51)).astype(np.uint8)
    qlum, _ = km._quality_tables(q)
    out = km.decode_jpeg(km.encode_jpeg(img, quality=q))
    np.testing.assert_array_equal(out, _expect_gray(img, qlum))


def test_random_gray_entropy_lossless_with_restarts():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    qlum, _ = km._quality_tables(80)
    out = km.decode_jpeg(km.encode_jpeg(img, quality=80, restart_interval=2))
    np.testing.assert_array_equal(out, _expect_gray(img, qlum))


def test_random_color_quality_close():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (41, 59, 3)).astype(np.uint8)
    out = km.decode_jpeg(km.encode_jpeg(img, quality=90, restart_interval=4))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 12.0


def test_smooth_color_420_quality_close():
    rr, cc = np.mgrid[0:30, 0:46]
    img = np.stack([(rr * 2 + cc) % 200 + 20,
                    (rr + cc * 2) % 200 + 20,
                    (rr + cc) % 200 + 20], axis=2).astype(np.uint8)
    out = km.decode_jpeg(km.encode_jpeg(img, quality=90, subsampling="420"))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8.0


def test_rejects_progressive_and_non_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        km.decode_jpeg(b"\x89PNG not a jpeg")
    img = _block_gray(8, 8)
    raw = bytearray(km.encode_jpeg(img))
    i = raw.find(b"\xFF\xC0")
    raw[i + 1] = 0xC2                      # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        km.decode_jpeg(bytes(raw))


def test_decoder_uses_stream_tables_not_defaults():
    # Re-point the DQT to a doubled luma table: decoder must dequantize
    # with the stream's table, so pixels change in the expected way.
    img = _block_gray(16, 16)              # DC-only fixture
    raw = bytearray(km.encode_jpeg(img, quality=None))
    i = raw.find(b"\xFF\xDB")
    body = np.frombuffer(bytes(raw[i + 5:i + 69]), dtype=np.uint8)
    doubled = (body.astype(np.int64) * 2).clip(1, 255).astype(np.uint8)
    raw[i + 5:i + 69] = doubled.tobytes()
    out = km.decode_jpeg(bytes(raw))
    # DC doubled => pixel deviation from 128 doubles (clamped)
    exp = np.clip(128 + (img.astype(np.int64) - 128) * 2, 0, 255)
    np.testing.assert_array_equal(out, exp.astype(np.uint8))


def test_jpeg_features_gray_repeats_channels():
    img = _block_gray(16, 24)
    f = km.jpeg_features(km.encode_jpeg(img))
    assert (f["width"], f["height"]) == (24, 16)
    assert f["mean_r"] == f["mean_g"] == f["mean_b"] == img.mean()


def test_decode_media_real_jpeg_distributed(spark):
    from gdal_spark.operators import multimodal as mm

    docs = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    feats = {r["doc_id"]: r
             for r in mm.decode_media_real(
                 mm.synth_jpeg_col_rows(docs)).collect()}
    assert len(feats) == 24
    for did in range(24):
        w, h = 9 + did % 16, 9 + did % 12
        rr, cc = np.mgrid[0:h, 0:w]
        a = ((did * 7 + (rr // 8) * 13 + (cc // 8) * 3) % 256)
        r = feats[did]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_r"] == pytest.approx(a.mean(), abs=0)


def test_multi_scan_jpeg_raises_not_garbage():
    # A baseline JPEG split into per-component scans is spec-valid but
    # unsupported — must raise, not return color-shifted pixels
    # (review finding).  Truncate the SOS component list to 1 of 3.
    rr, cc, ch = np.mgrid[0:16, 0:16, 0:3]
    img = (((rr // 8) * 13 + (cc // 8) * 3 + ch * 11) % 256).astype(np.uint8)
    raw = bytearray(km.encode_jpeg(img))
    i = raw.find(b"\xFF\xDA")
    # SOS: len(2) ns(1) [cs tt]*ns ss se ah_al — rewrite ns=1, keep comp 1
    comp1 = bytes(raw[i + 5:i + 7])
    tail = bytes(raw[i + 5 + 6:])      # ss/se/ahal + entropy data
    import struct
    new_sos = b"\xFF\xDA" + struct.pack(">H", 2 + 1 + 2 + 3) + b"\x01" \
        + comp1 + tail[:3]
    with pytest.raises(ValueError, match="multi-scan"):
        km.decode_jpeg(bytes(raw[:i]) + new_sos + tail[3:])


def test_huff_lut_cache_bounded():
    from gdal_spark.kernels.media import _HUFF_LUT_CACHE, _huff_decode_table
    for v in range(80):
        bits = [0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
        _huff_decode_table(bits, [v % 256, (v + 1) % 256])
    assert len(_HUFF_LUT_CACHE) <= 64
