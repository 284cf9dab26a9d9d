"""Media codec kernels (kernels/media.py): WAV/BMP roundtrips,
feature extraction, and the distributed decode path."""

import numpy as np
import pytest

from gdal_spark.kernels import media as km


def test_wav_roundtrip():
    s = np.array([0, 1, -1, 32767, -32768, 100], dtype=np.int16)
    rate, out = km.decode_wav(km.encode_wav(s, rate=44100))
    assert rate == 44100
    np.testing.assert_array_equal(out, s)


def test_wav_extra_chunk_walk():
    # RIFF chunk list may interleave unknown chunks between fmt and data.
    s = np.arange(-5, 5, dtype=np.int16)
    raw = bytearray(km.encode_wav(s, rate=8000))
    # splice a junk chunk right after 'fmt ' (ends at 12+8+16=36)
    junk = b"LIST" + (7).to_bytes(4, "little") + b"junk123" + b"\x00"  # padded
    raw2 = bytes(raw[:36]) + junk + bytes(raw[36:])
    rate, out = km.decode_wav(raw2)
    assert rate == 8000
    np.testing.assert_array_equal(out, s)


def test_wav_rejects_non_pcm():
    raw = bytearray(km.encode_wav(np.zeros(4, dtype=np.int16)))
    raw[20] = 3  # fmt tag -> IEEE float
    with pytest.raises(ValueError, match="non-PCM"):
        km.decode_wav(bytes(raw))


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (8, 6), (15, 11), (5, 7)])
def test_bmp_roundtrip_all_paddings(w, h):
    # w=1,3,5 exercise every row-padding remainder (3w mod 4).
    rng = np.random.default_rng(w * 100 + h)
    a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = km.decode_bmp(km.encode_bmp(a))
    np.testing.assert_array_equal(out, a)


def test_bmp_features_match_array():
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    a[:, :, 0] = 10
    a[:, :, 1] = 20
    a[:, :, 2] = 255
    f = km.bmp_features(km.encode_bmp(a))
    assert f == {"width": 4, "height": 4,
                 "mean_r": 10.0, "mean_g": 20.0, "mean_b": 255.0}


def test_wav_features_formula():
    s = np.array([3, -4], dtype=np.int16)
    f = km.wav_features(km.encode_wav(s, rate=1000))
    assert f["rate"] == 1000 and f["n_samples"] == 2
    assert f["duration_ms"] == 2
    assert f["peak"] == 4
    assert f["rms"] == np.sqrt((9 + 16) / 2)


def test_bmp_decimate():
    a = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    d = km.bmp_decimate(km.encode_bmp(a), 2)
    np.testing.assert_array_equal(d, a[::2, ::2])


def test_decode_media_real_distributed(spark):
    from gdal_spark.operators import multimodal as mm

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = mm.synth_media_col_rows(docs)
    rows = {r["doc_id"]: r for r in mm.decode_media_real(media).collect()}
    assert len(rows) == 40
    # spot-check one wav and one bmp against the serial kernels
    did = 6
    n = 64 + did % 64
    i = np.arange(n)
    s = ((did * 31 + i * 17) % 2048) - 1024
    r = rows[did]
    assert r["kind"] == "wav" and r["n_samples"] == n
    assert r["peak"] == int(np.abs(s).max())
    assert r["rms"] == pytest.approx(float(np.sqrt((s.astype(float) ** 2).mean())), abs=0)
    did = 7
    w, h = 8 + did % 8, 6 + did % 6
    rr, cc = np.mgrid[0:h, 0:w]
    r = rows[did]
    assert r["kind"] == "bmp" and (r["width"], r["height"]) == (w, h)
    assert r["mean_r"] == float(((did * 7 + rr * 13 + cc * 3) % 256).mean())


def test_decode_media_real_rejects_unknown_kind(spark):
    from gdal_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, "mp4", bytearray(b"\x00\x00\x00 ftypisom"))],
        "doc_id long, kind string, payload binary")
    with pytest.raises(Exception, match="no stdlib codec"):
        mm.decode_media_real(df).collect()


# ---- PNG ------------------------------------------------------------------
def test_png_roundtrip_all_filters_and_colortypes():
    rng = np.random.default_rng(11)
    for shape in [(7, 5, 3), (6, 4, 4), (9, 3), (5, 5, 3),
                  (1, 8, 3), (8, 1, 3), (1, 1)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        for mode in ("cycle", "none"):
            back = km.decode_png(km.encode_png(a, mode))
            assert back.shape == a.shape
            assert (back == a).all(), (shape, mode)


def test_png_decodes_external_bytes():
    """A widely-published externally-encoded 1x1 RGBA PNG must decode
    to its known pixel (255, 0, 0, 127) — validates signature, chunk
    walk, zlib stream, and IHDR parse against a foreign encoder."""
    import base64
    b64 = ("iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
           "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    a = km.decode_png(base64.b64decode(b64))
    assert a.shape == (1, 1, 4)
    assert a.tolist() == [[[255, 0, 0, 127]]]


def test_png_rejects_unsupported():
    a = np.zeros((4, 4), dtype=np.uint8)
    blob = bytearray(km.encode_png(a))
    with pytest.raises(ValueError, match="not a PNG"):
        km.decode_png(b"\x00" + bytes(blob[1:]))
    blob[24] = 16                       # depth byte in IHDR
    with pytest.raises(ValueError, match="8-bit"):
        km.decode_png(bytes(blob))


def test_png_features_gray_repeats_channels():
    a = (np.arange(30, dtype=np.uint8).reshape(6, 5) * 7) % 256
    f = km.png_features(km.encode_png(a))
    assert f["width"] == 5 and f["height"] == 6
    assert f["mean_r"] == f["mean_g"] == f["mean_b"] == a.mean()


def test_decode_image_real_dispatches_by_magic():
    from gdal_spark.operators.multimodal import decode_image_real

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(16, 24, 3), dtype=np.uint8)

    # lossless containers decode bit-exact
    np.testing.assert_array_equal(decode_image_real(km.encode_png(img)), img)
    np.testing.assert_array_equal(decode_image_real(km.encode_bmp(img)), img)

    # baseline JPEG is lossy: same shape/dtype, bounded error on a
    # smooth gradient (random noise would stress the quantizer)
    grad = np.tile(
        np.linspace(0, 255, 24, dtype=np.uint8), (16, 1)
    )[..., None].repeat(3, axis=2)
    out = decode_image_real(km.encode_jpeg(grad, quality=90))
    assert out.shape == grad.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - grad.astype(int)).mean() < 8


def test_decode_image_real_unknown_magic_fails_loudly():
    from gdal_spark.operators.multimodal import decode_image_real

    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present: foreign formats are handed to it")
    except ImportError:
        pass
    with pytest.raises(ValueError, match="unrecognized image container"):
        decode_image_real(b"GIF89a" + b"\x00" * 32)
