"""GDAL golden checksum, vectorized.

Reproduces GDALChecksumImage (/root/reference/alg/gdalchecksum.cpp:
49-56 primes, 71-88 float->int conversion, 169-189/223-233
accumulation): per value ``sum += int32(v) % primes[(row*W + col) %
11]`` with primes {7,11,13,17,19,23,29,31,37,41,43}, masked to 16
bits.  The mask is applied per line in C; because ``(a + b) & 0xffff
== ((a & 0xffff) + b) & 0xffff`` in two's complement, masking once at
the end is bit-identical — we exploit that to stay fully vectorized.

Float conversion rule (GDALCopyWords float->Int32 semantics,
gdalchecksum.cpp:66-88): non-finite -> INT_MIN; else v += 0.5,
clamp to [-2147483647, 2147483647], floor.  The C ``%`` operator is a
*truncated* remainder (can be negative) — numpy's ``%`` is floored —
so we use np.fmod which matches C.

Canonical golden: byte.tif band 1 == 4672
(/root/reference/autotest/gcore/tiff_read.py:45); our fixtures carry
their own oracle-derived goldens (FIXTURES.md §4).
"""

from __future__ import annotations

import numpy as np

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)
_INT_MIN = -2147483648

# Golden for the FIXTURES.md §4 grid20 fixture (20x20 uint8,
# px[r*20+c] = (r*20+c)*7 % 256) under this checksum — frozen at
# fixture-generation time, role of byte.tif's 4672.
GRID20_GOLDEN = 4694


def float_to_int32_gdal(arr):
    """GDALCopyWords double->Int32: +0.5, clamp, floor; non-finite -> INT_MIN."""
    a = np.asarray(arr, dtype=np.float64)
    shifted = a + 0.5
    out = np.where(
        shifted < -2147483647.0,
        np.float64(-2147483647.0),
        np.where(shifted > 2147483647.0, np.float64(2147483647.0), shifted),
    )
    out = np.floor(out)
    res = np.where(np.isfinite(a), out, np.float64(_INT_MIN))
    return res.astype(np.int64)


def checksum(pixels, width=None, is_float=False):
    """16-bit golden checksum of a full 2-D window starting at (0,0).

    pixels: 2-D array (H, W) of any integer dtype, or 1-D with
            explicit width; float dtypes set is_float (or pass
            is_float=True) to apply the float->int32 rule.
    """
    a = np.asarray(pixels)
    if a.ndim == 1:
        if width is None:
            raise ValueError("1-D pixel buffer needs width")
        a = a.reshape(-1, width)
    h, w = a.shape
    if is_float or np.issubdtype(a.dtype, np.floating):
        vals = float_to_int32_gdal(a.ravel())
    else:
        vals = a.ravel().astype(np.int64)
    idx = np.arange(h * w, dtype=np.int64) % 11
    # C-style truncated remainder
    rem = np.fmod(vals, PRIMES[idx])
    total = int(rem.sum())
    return total & 0xFFFF
