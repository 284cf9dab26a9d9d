"""Pure-stdlib media codecs: canonical PCM WAV and 24-bit
uncompressed BMP (both public byte layouts: RIFF/WAVE spec, Windows
BITMAPINFOHEADER spec).

These upgrade the multimodal pipeline from "honest stub" to REAL
decode for the two formats a no-dependency container can parse —
struct + numpy only, no PIL/ffmpeg.  Compressed codecs (jpeg/mp4)
remain behind the stub (operators/multimodal.py), clearly flagged.

Encoders exist so fixtures can synthesize deterministic media from
formulas; the catalog oracle then re-derives the decoded features
straight from the generating formula in SQL — if the decoder mangled
a single byte, the features would not hash-match.

Reference parity: GDAL's own BMP driver reads the same layout —
BITMAPINFOHEADER fields incl. the positive-height bottom-up rule and
BGR component order (frmts/bmpdataset.cpp:115-129 header struct,
:378-394 24-bit component offsets, :282 scanline stride rounded to 4
bytes).  GDAL has no audio driver; WAV follows the public RIFF spec.
"""

from __future__ import annotations

import struct

import numpy as np


# ---- WAV (RIFF canonical PCM) --------------------------------------------
def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> canonical 44-byte-header PCM WAV."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    n = len(data)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", n)
    return hdr + data


def decode_wav(payload: bytes):
    """Canonical PCM WAV -> (rate, int16 numpy samples).  Walks the
    RIFF chunk list (fmt / data may have extra chunks between)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, nch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt, nch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if fmt != 1:
                raise ValueError(f"non-PCM wav (fmt={fmt})")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16 or nch != 1:
        raise ValueError(f"only 16-bit mono supported ({bits}b x{nch})")
    return rate, np.frombuffer(data, dtype="<i2")


# ---- BMP (BITMAPINFOHEADER, 24-bit, uncompressed) -------------------------
def encode_bmp(rgb: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit bottom-up BMP with row padding."""
    h, w, _ = rgb.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    data_sz = stride * h
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + data_sz, 0, 0, 14 + 40)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_sz,
                       2835, 2835, 0, 0)
    body = bytearray()
    for r in range(h - 1, -1, -1):            # bottom-up rows
        body += rgb[r, :, ::-1].tobytes()     # BGR order
        body += b"\x00" * pad
    return hdr + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> HxWx3 uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack("<I", payload[10:14])
    hsz, w, h, _planes, bits, comp = struct.unpack(
        "<IiiHHI", payload[14:34])
    if bits != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed supported ({bits})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=off)
    arr = arr.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if flip:
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()             # BGR -> RGB


# ---- features --------------------------------------------------------------
def wav_features(payload: bytes) -> dict:
    rate, s = decode_wav(payload)
    x = s.astype(np.float64)
    return {
        "rate": int(rate),
        "n_samples": int(s.size),
        "duration_ms": int(s.size * 1000 // rate),
        "rms": float(np.sqrt((x * x).mean())) if s.size else 0.0,
        "peak": int(np.abs(s).max()) if s.size else 0,
    }


def bmp_features(payload: bytes) -> dict:
    a = decode_bmp(payload)
    return {
        "width": int(a.shape[1]),
        "height": int(a.shape[0]),
        "mean_r": float(a[:, :, 0].mean()),
        "mean_g": float(a[:, :, 1].mean()),
        "mean_b": float(a[:, :, 2].mean()),
    }


def bmp_decimate(payload: bytes, factor: int) -> np.ndarray:
    """Nearest (top-left) downsample — the resize-by-decimation step
    of a media feature pipeline (overview 'near' rule)."""
    return decode_bmp(payload)[::factor, ::factor]
