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


# ---- PNG (spec-written: zlib + the 5 scanline filters) --------------------
# PNG 1.2 spec (also ISO/IEC 15948): 8-byte signature, chunked layout
# (IHDR/IDAT/IEND, each len+type+data+crc32), IDAT is one zlib stream
# of H scanlines, each prefixed by a filter-type byte 0-4.  Reference
# parity: GDAL's PNG driver reads the same layout via libpng
# (frmts/png/pngdataset.cpp); here the codec is written straight from
# the public spec like the TIFF one (kernels/tiff.py) — 8-bit depth,
# color types 0 (gray), 2 (RGB), 6 (RGBA), no interlace.
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _paeth(a, b, c):
    """PaethPredictor (PNG spec 9.4), vectorized over int16+ arrays."""
    p = a.astype(np.int16) + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(img: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """uint8 image (H,W) gray / (H,W,3) RGB / (H,W,4) RGBA -> PNG.

    ``filter_mode="cycle"`` assigns scanline r the filter r % 5, so any
    image >= 5 rows tall exercises ALL five filter types — fixtures
    built with it prove every decoder unfilter path against the
    generating formula.  ``"none"`` writes filter 0 throughout."""
    import zlib
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype, ch = 0, 1
        img = img[:, :, None]
    elif img.shape[2] == 3:
        ctype, ch = 2, 3
    elif img.shape[2] == 4:
        ctype, ch = 6, 4
    else:
        raise ValueError(f"unsupported channel count {img.shape[2]}")
    h, w, _ = img.shape
    raw = img.reshape(h, w * ch).astype(np.int16)
    prior = np.zeros(w * ch, dtype=np.int16)
    left = np.zeros_like(raw[0])
    out = bytearray()
    for r in range(h):
        cur = raw[r]
        f = (r % 5) if filter_mode == "cycle" else 0
        left[:ch] = 0
        left[ch:] = cur[:-ch]
        pleft = np.zeros_like(prior)
        pleft[ch:] = prior[:-ch]
        if f == 0:
            filt = cur
        elif f == 1:                       # Sub
            filt = cur - left
        elif f == 2:                       # Up
            filt = cur - prior
        elif f == 3:                       # Average
            filt = cur - ((left + prior) >> 1)
        else:                              # Paeth
            filt = cur - _paeth(left.astype(np.uint8),
                                prior.astype(np.uint8),
                                pleft.astype(np.uint8))
        out.append(f)
        out += (filt & 0xFF).astype(np.uint8).tobytes()
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> uint8 array (H,W) for gray, (H,W,ch) otherwise.  All 5
    filter types; Sub reconstructs as a per-lane cumsum, Up as one
    vector add, Average/Paeth walk pixels with whole-pixel vectors."""
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        ctag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if ctag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or ctype not in _PNG_CHANNELS:
                raise ValueError(
                    f"only 8-bit gray/RGB/RGBA supported "
                    f"(depth={depth}, color type={ctype})")
            if ilace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctag == b"IDAT":
            idat += body
        elif ctag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes, rows = raw[:, 0], raw[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f, cur = int(ftypes[r]), rows[r]
        if f == 0:
            rec = cur.copy()
        elif f == 1:                       # Sub: cumsum per byte lane
            rec = np.cumsum(cur.reshape(w, ch).astype(np.int64), axis=0)
            rec = (rec & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:                       # Up
            rec = cur + prior
        elif f == 3:                       # Average
            rec = np.empty(stride, dtype=np.uint8)
            px = cur.reshape(w, ch).astype(np.int16)
            pr = prior.reshape(w, ch).astype(np.int16)
            left = np.zeros(ch, dtype=np.int16)
            rv = rec.reshape(w, ch)
            for i in range(w):
                left = (px[i] + ((left + pr[i]) >> 1)) & 0xFF
                rv[i] = left
        elif f == 4:                       # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            px = cur.reshape(w, ch)
            pr = prior.reshape(w, ch)
            left = np.zeros(ch, dtype=np.uint8)
            upleft = np.zeros(ch, dtype=np.uint8)
            rv = rec.reshape(w, ch)
            for i in range(w):
                left = (px[i].astype(np.int16)
                        + _paeth(left, pr[i], upleft)) & 0xFF
                left = left.astype(np.uint8)
                rv[i] = left
                upleft = pr[i]
        else:
            raise ValueError(f"bad filter type {f}")
        out[r] = rec
        prior = out[r]
    if ctype == 0:
        return out.reshape(h, w)
    return out.reshape(h, w, ch)


def png_features(payload: bytes) -> dict:
    a = decode_png(payload)
    if a.ndim == 2:
        a = a[:, :, None].repeat(3, axis=2)
    return {
        "width": int(a.shape[1]),
        "height": int(a.shape[0]),
        "mean_r": float(a[:, :, 0].mean()),
        "mean_g": float(a[:, :, 1].mean()),
        "mean_b": float(a[:, :, 2].mean()),
    }
