"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
the Spark-side contract a 100 TB interleaved corpus needs: schema,
partitioning, Arrow batch shape, and UDF signatures are real and
tested.  Decode is REAL for every modality via the spec-written
stdlib codecs in kernels/media.py (WAV audio; BMP/PNG/baseline-JPEG
images; AVI video with per-frame sampling; MP4/ISO-BMFF metadata
box walk); only the codec sample payloads inside MP4 mdat (H.264/
AAC) stay behind the clearly-marked stub, since no codec library
ships in this container.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, luma bigint"
)


def synth_payload_col(doc_id: Column) -> Column:
    """Deterministic 16-byte binary payload: unhex(md5(doc_id)).

    Stands in for a real media blob; identical bytes are derivable in
    the DuckDB oracle from the same md5 hex string.
    """
    return F.unhex(F.md5(doc_id.cast("string")))


def decode_media_stub(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """'Decode' media payloads into features — Arrow-batched numpy.

    Fake-but-deterministic codec: width/height from the first four
    bytes (big-endian, bounded to screen-ish dims), luma = sum of
    bytes 4..11.  Replace `_decode_batch` with a real codec (PIL /
    ffmpeg) where available; the Spark plumbing (mapInPandas over
    binary, explicit output schema, batch-shaped work) is the real
    deliverable here.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = np.frombuffer(
                b"".join(pdf[payload_col]), dtype=np.uint8
            ).reshape(len(pdf), -1)
            out = pd.DataFrame({
                "doc_id": pdf[id_col].to_numpy(),
                "byte_len": np.full(len(pdf), raw.shape[1], dtype=np.int32),
                "width": (
                    (raw[:, 0].astype(np.int64) << 8) | raw[:, 1]
                ).astype(np.int64) % 1920,
                "height": (
                    (raw[:, 2].astype(np.int64) << 8) | raw[:, 3]
                ).astype(np.int64) % 1080,
                "luma": raw[:, 4:12].astype(np.int64).sum(axis=1),
            })
            yield out

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _decode_batch, FEATURE_SCHEMA
    )


def decode_image_real(payload: bytes) -> np.ndarray:
    """Real image decode to an HxWx3 uint8 RGB array.

    Dispatches on magic bytes to the spec-written stdlib codecs in
    kernels/media.py (PNG, baseline JPEG, BMP — the formats this
    engine writes and reads from scratch).  Other container formats
    (GIF, WebP, TIFF-as-image, ...) fall back to PIL when it is
    installed; without PIL they raise ValueError naming the format,
    so an unsupported payload fails loudly instead of silently.
    """
    from gdal_spark.kernels import media as km

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return km.decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return km.decode_jpeg(payload)
    if payload[:2] == b"BM":
        return km.decode_bmp(payload)
    try:
        from PIL import Image
        import io

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError as exc:
        head = payload[:8].hex()
        raise ValueError(
            f"unrecognized image container (magic {head}); built-in "
            "codecs cover PNG/JPEG/BMP and PIL is not installed"
        ) from exc


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 stride: int = 30, fps_ms: int = 33) -> DataFrame:
    """Video frame sampling: each doc 'has' 1 + (id % 120) frames;
    emit every ``stride``-th frame index with its timestamp.

    The explode is JVM-side (sequence), so sampling a 10^12-row video
    table never touches Python.
    """
    n_frames = F.lit(1) + (F.col(id_col) % 120)
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(stride))
    return df.select(
        F.col(id_col), F.explode(idx).alias("frame_idx")
    ).withColumn("ts_ms", F.col("frame_idx") * fps_ms)


def decode_media_real(df: DataFrame, id_col: str = "doc_id",
                      kind_col: str = "kind",
                      payload_col: str = "payload") -> DataFrame:
    """REAL media decode for the stdlib-parsable formats: canonical
    PCM WAV, 24-bit uncompressed BMP, PNG (zlib + 5 filters) and
    baseline JPEG (spec-written T.81 codec) — kernels/media.py,
    struct + zlib + numpy, no external codec.  Remaining compressed
    formats (mp4/webp/...) stay behind decode_media_stub, clearly
    flagged.

    One Arrow pass; per-kind feature columns (0 where not
    applicable): rate, n_samples, duration_ms, rms, peak for audio;
    width, height, mean_r/g/b for images.
    """
    from ..kernels import media as km

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, kind, payload in zip(
                    pdf[id_col], pdf[kind_col], pdf[payload_col]):
                base = {"doc_id": did, "kind": kind,
                        "rate": 0, "n_samples": 0, "duration_ms": 0,
                        "rms": 0.0, "peak": 0, "width": 0, "height": 0,
                        "mean_r": 0.0, "mean_g": 0.0, "mean_b": 0.0}
                if kind == "wav":
                    base.update(km.wav_features(bytes(payload)))
                elif kind == "bmp":
                    base.update(km.bmp_features(bytes(payload)))
                elif kind == "png":
                    base.update(km.png_features(bytes(payload)))
                elif kind == "jpeg":
                    base.update(km.jpeg_features(bytes(payload)))
                else:
                    raise ValueError(
                        f"no stdlib codec for kind={kind!r}; "
                        "use decode_media_stub for compressed formats")
                rows.append(base)
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        _decode,
        "doc_id long, kind string, rate int, n_samples int, "
        "duration_ms int, rms double, peak int, width int, height int, "
        "mean_r double, mean_g double, mean_b double")


def synth_media_col_rows(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture builder: deterministic WAV (even ids) / BMP (odd ids)
    blobs from pure doc_id formulas, so the decode oracle can restate
    the features in SQL without touching bytes."""
    from ..kernels import media as km

    def _mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                if did % 2 == 0:
                    n = 64 + did % 64
                    i = np.arange(n, dtype=np.int64)
                    s = ((did * 31 + i * 17) % 2048) - 1024
                    rows.append({"doc_id": did, "kind": "wav",
                                 "payload": km.encode_wav(s, rate=8000)})
                else:
                    w, h = 8 + did % 8, 6 + did % 6
                    rr, cc, ch = np.mgrid[0:h, 0:w, 0:3]
                    a = ((did * 7 + rr * 13 + cc * 3 + ch * 11)
                         % 256).astype(np.uint8)
                    rows.append({"doc_id": did, "kind": "bmp",
                                 "payload": km.encode_bmp(a)})
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(
        _mk, "doc_id long, kind string, payload binary")


def frame_sample_real(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload",
                      stride: int = 2) -> DataFrame:
    """REAL video frame sampling: decode AVI container bytes
    (kernels/media.py — RIFF walk + per-frame DIB decode), emit every
    ``stride``-th frame with its timestamp and per-frame channel
    means.  One Arrow pass; the per-doc frame explode happens inside
    the batch (numpy slicing), so the exchanged payload is decoded
    exactly once where it lands — the decode-where-the-bytes-are rule
    that keeps a 100 TB video corpus off the driver."""
    from ..kernels import media as km

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar accumulators: the per-frame feature math is one
            # vectorized mean over ALL sampled frames of a payload, and
            # the batch is assembled from arrays, not per-row dicts —
            # this loop is the hot path of a video-corpus scan
            dids, idxs, tss, ws, hs = [], [], [], [], []
            means = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, scale, frames = km.decode_avi(bytes(payload))
                n, h, w, _ = frames.shape
                sampled = frames[::stride]
                k = sampled.shape[0]
                means.append(
                    sampled.reshape(k, -1, 3).mean(axis=1,
                                                   dtype=np.float64))
                fidx = np.arange(0, n, stride, dtype=np.int64)
                idxs.append(fidx)
                tss.append(fidx * (1000 * scale) // rate)
                dids.append(np.full(k, did, dtype=np.int64))
                ws.append(np.full(k, w, dtype=np.int32))
                hs.append(np.full(k, h, dtype=np.int32))
            if not dids:
                continue
            m = np.concatenate(means)
            yield pd.DataFrame({
                "doc_id": np.concatenate(dids),
                "frame_idx": np.concatenate(idxs).astype(np.int32),
                "ts_ms": np.concatenate(tss),
                "width": np.concatenate(ws),
                "height": np.concatenate(hs),
                "mean_r": m[:, 0], "mean_g": m[:, 1], "mean_b": m[:, 2],
            })

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _sample,
        "doc_id long, frame_idx int, ts_ms long, width int, height int, "
        "mean_r double, mean_g double, mean_b double")


def synth_avi_col_rows(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture builder for the AVI decode path: deterministic
    uncompressed-DIB videos from pure doc_id formulas — frame count,
    dims, and frame rate all vary per doc; pixel(f,r,c,ch) =
    (doc_id*7 + f*19 + r*13 + c*3 + ch*11) % 256, so the oracle can
    restate per-sampled-frame features in SQL."""
    from ..kernels import media as km

    def _mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                nf = 4 + did % 9
                w, h = 6 + did % 8, 5 + did % 6
                ff, rr, cc, ch = np.mgrid[0:nf, 0:h, 0:w, 0:3]
                a = ((did * 7 + ff * 19 + rr * 13 + cc * 3 + ch * 11)
                     % 256).astype(np.uint8)
                rows.append({"doc_id": did, "kind": "avi",
                             "payload": km.encode_avi(
                                 a, rate=10 + did % 10)})
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(
        _mk, "doc_id long, kind string, payload binary")


def mp4_meta(df: DataFrame, id_col: str = "doc_id",
             payload_col: str = "payload") -> DataFrame:
    """REAL ISO BMFF (MP4) metadata extraction: box walk over the
    container bytes (kernels/media.py::decode_mp4_meta — ftyp brand,
    mvhd duration, per-track tkhd dims / hdlr handler / stsz sample
    counts).  One Arrow pass; codec payloads inside mdat are NOT
    decoded (that genuinely needs external codecs and stays behind
    decode_media_stub)."""
    from ..kernels import media as km

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                m = km.decode_mp4_meta(bytes(payload))
                vid = next((tr for tr in m["tracks"]
                            if tr["handler"] == "vide"), None)
                aud = next((tr for tr in m["tracks"]
                            if tr["handler"] == "soun"), None)
                rows.append({
                    "doc_id": did, "brand": m["brand"],
                    "duration_ms": m["duration_ms"],
                    "n_tracks": m["n_tracks"],
                    "width": vid["width"] if vid else 0,
                    "height": vid["height"] if vid else 0,
                    "n_samples_v": vid["n_samples"] if vid else 0,
                    "n_samples_a": aud["n_samples"] if aud else 0,
                })
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _meta,
        "doc_id long, brand string, duration_ms long, n_tracks int, "
        "width int, height int, n_samples_v int, n_samples_a int")


def synth_mp4_col_rows(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture builder for the MP4 metadata path: minimal valid ISO
    BMFF files from pure doc_id formulas — brand, duration, video
    dims, and per-track sample counts all vary per doc; every 4th doc
    is audio-only (no vide track)."""
    from ..kernels import media as km

    def _mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                brand = b"mp42" if did % 2 == 0 else b"isom"
                tracks = []
                if did % 4 != 0:
                    tracks.append((b"vide", 320 + (did % 64) * 2,
                                   180 + (did % 36) * 2,
                                   24 * (1 + did % 5)))
                tracks.append((b"soun", 0, 0, 100 + did % 50))
                rows.append({"doc_id": did, "kind": "mp4",
                             "payload": km.encode_mp4_meta(
                                 tracks, timescale=600,
                                 duration=157 * (1 + did % 40),
                                 brand=brand)})
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(
        _mk, "doc_id long, kind string, payload binary")


def synth_jpeg_col_rows(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture builder for the JPEG decode path: deterministic
    grayscale baseline JPEGs from pure doc_id formulas.  Pixels are
    CONSTANT within each aligned 8x8 block and the encoder writes unit
    quantization tables, so the lossy pipeline (DCT -> quantize ->
    Huffman -> dequantize -> IDCT) reproduces every pixel EXACTLY and
    the oracle can restate the features from the generating block
    formula in SQL.  Dims vary per doc (including non-multiples of 8,
    exercising MCU edge padding) and the restart interval cycles
    doc_id % 4 (0 = no DRI), exercising RSTn resync + predictor
    resets under the value-exact gate."""
    from ..kernels import media as km

    def _mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 9 + did % 16, 9 + did % 12
                rr, cc = np.mgrid[0:h, 0:w]
                a = ((did * 7 + (rr // 8) * 13 + (cc // 8) * 3)
                     % 256).astype(np.uint8)
                rows.append({"doc_id": did, "kind": "jpeg",
                             "payload": km.encode_jpeg(
                                 a, restart_interval=did % 4)})
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(
        _mk, "doc_id long, kind string, payload binary")


def synth_png_col_rows(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture builder for the PNG decode path: deterministic payloads
    from pure doc_id formulas, cycling gray / RGB / RGBA by doc_id % 3
    and the per-scanline filter by row % 5 (encode_png "cycle"), so
    decoding a batch exercises every color type AND all five PNG
    filter types; the oracle restates the features from the same
    formulas in SQL."""
    from ..kernels import media as km

    def _mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 5 + did % 8, 5 + did % 6
                k = did % 3
                if k == 0:                 # gray (color type 0)
                    rr, cc = np.mgrid[0:h, 0:w]
                    a = ((did * 7 + rr * 13 + cc * 3) % 256).astype(np.uint8)
                else:                      # RGB (2) / RGBA (6)
                    ch = 3 if k == 1 else 4
                    rr, cc, kk = np.mgrid[0:h, 0:w, 0:ch]
                    a = ((did * 7 + rr * 13 + cc * 3 + kk * 11)
                         % 256).astype(np.uint8)
                rows.append({"doc_id": did, "kind": "png",
                             "payload": km.encode_png(a, "cycle")})
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(
        _mk, "doc_id long, kind string, payload binary")
