"""AVI container codec (kernels/media.py) + real frame sampling.

The container is RIFF 'AVI ' with uncompressed 24-bit DIB frames —
the same bottom-up BGR row-padded pixel layout as BMP, so decode is
exact and the catalog oracle (media_decode_avi) re-derives every
sampled frame's features from the generating pixel formula.
"""

import numpy as np
import pytest

from gdal_spark.kernels import media as km


@pytest.mark.parametrize("n,h,w", [(1, 5, 6), (4, 7, 9), (9, 6, 5),
                                   (3, 8, 8), (2, 1, 1)])
def test_avi_roundtrip_exact(n, h, w):
    rng = np.random.default_rng(n * 100 + h * 10 + w)
    fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    rate, scale, out = km.decode_avi(km.encode_avi(fr, rate=12, scale=1))
    assert (rate, scale) == (12, 1)
    np.testing.assert_array_equal(out, fr)


def test_avi_header_fields():
    fr = np.zeros((5, 4, 6, 3), dtype=np.uint8)
    f = km.avi_features(km.encode_avi(fr, rate=25, scale=1))
    assert f["n_frames"] == 5 and (f["width"], f["height"]) == (6, 4)
    assert f["rate"] == 25 and f["duration_ms"] == 5 * 1000 // 25


def test_avi_tolerates_unknown_chunks():
    fr = np.arange(2 * 3 * 4 * 3, dtype=np.uint8).reshape(2, 3, 4, 3)
    raw = bytearray(km.encode_avi(fr))
    # splice a junk chunk right after the 'AVI ' fourcc (offset 12)
    junk = b"JUNK" + (6).to_bytes(4, "little") + b"abcdef"
    raw2 = bytes(raw[:12]) + junk + bytes(raw[12:])
    # fix the RIFF size field
    raw2 = raw2[:4] + (len(raw2) - 8).to_bytes(4, "little") + raw2[8:]
    _, _, out = km.decode_avi(raw2)
    np.testing.assert_array_equal(out, fr)


def test_avi_rejects_compressed_and_non_avi():
    with pytest.raises(ValueError, match="not an AVI"):
        km.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    fr = np.zeros((1, 4, 4, 3), dtype=np.uint8)
    raw = bytearray(km.encode_avi(fr))
    i = raw.find(b"strf")
    # biCompression field: strf body starts at i+8, compression at +16
    raw[i + 8 + 16:i + 8 + 20] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ValueError, match="BI_RGB"):
        km.decode_avi(bytes(raw))


def test_frame_sample_real_distributed(spark):
    from gdal_spark.operators import multimodal as mm

    docs = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    rows = mm.frame_sample_real(
        mm.synth_avi_col_rows(docs), stride=2).collect()
    by_key = {(r["doc_id"], r["frame_idx"]): r for r in rows}
    total = 0
    for did in range(12):
        nf = 4 + did % 9
        w, h = 6 + did % 8, 5 + did % 6
        rate = 10 + did % 10
        for f in range(0, nf, 2):
            total += 1
            r = by_key[(did, f)]
            assert (r["width"], r["height"]) == (w, h)
            assert r["ts_ms"] == f * 1000 // rate
            rr, cc = np.mgrid[0:h, 0:w]
            exp = float(((did * 7 + f * 19 + rr * 13 + cc * 3) % 256).mean())
            assert r["mean_r"] == exp
    assert len(rows) == total


def test_avi_with_audio_stream_decodes_video():
    # A wild AVI carries an 'auds' strl whose strf is WAVEFORMATEX —
    # it must NOT be validated as a BITMAPINFOHEADER (review finding).
    import struct
    fr = np.arange(2 * 4 * 5 * 3, dtype=np.uint8).reshape(2, 4, 5, 3)
    raw = km.encode_avi(fr, rate=10)

    def chunk(tag, body):
        out = tag + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) % 2 else b"")

    auds_strh = (b"auds" + b"\x00" * 4
                 + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0,
                               100, 0, 0, 0) + struct.pack("<4h", 0, 0, 0, 0))
    # WAVEFORMATEX: PCM, mono, 8 kHz, 16-bit -> bytes 14:16 are NOT 24
    auds_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", auds_strh)
                 + chunk(b"strf", auds_strf))
    # splice the audio strl into hdrl: rebuild the file around it
    i = raw.find(b"LIST", 12)          # hdrl LIST
    (hdrl_len,) = struct.unpack("<I", raw[i + 4:i + 8])
    hdrl_end = i + 8 + hdrl_len
    new_hdrl_body = raw[i + 8:hdrl_end] + strl
    rebuilt = (raw[:i] + chunk(b"LIST", new_hdrl_body) + raw[hdrl_end:])
    rebuilt = rebuilt[:4] + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    rate, scale, out = km.decode_avi(rebuilt)
    assert rate == 10
    np.testing.assert_array_equal(out, fr)


def test_avi_without_vids_stream_raises_cleanly():
    import struct
    fr = np.zeros((1, 4, 4, 3), dtype=np.uint8)
    raw = bytearray(km.encode_avi(fr))
    i = raw.find(b"strh")
    raw[i + 8:i + 12] = b"text"        # no vids stream any more
    with pytest.raises(ValueError, match="vids"):
        km.decode_avi(bytes(raw))
