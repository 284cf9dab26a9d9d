"""32-bit Hilbert curve, vectorized.

Reproduces the FlatGeobuf packed-R-tree Hilbert key used by the
reference for spatially-clustered feature ordering
(/root/reference/ogr/ogrsf_frmts/flatgeobuf/packedrtree.cpp:74-161,
itself based on the public-domain code at
github.com/rawrunprotected/hilbert_curves).  Inputs are 16-bit grid
coordinates (HILBERT_MAX = (1<<16)-1); output is the uint32 Hilbert
d-index.  The engine range-partitions by this key (north_rule:
"Hilbert-sorted cell id") so spatially-near cells land in the same
Spark partition / parquet file, giving min/max file-skipping on cell
ranges the same locality win the packed R-tree gives GDAL.
"""

from __future__ import annotations

import numpy as np

HILBERT_BITS = 16
HILBERT_MAX = (1 << HILBERT_BITS) - 1


def hilbert_u32(x, y):
    """Vectorized Hilbert index of 16-bit (x, y) grid coords.

    Accepts scalars or numpy arrays; returns uint32 ndarray (or scalar).
    Bit-for-bit equal to packedrtree.cpp:74-131 `hilbert(uint32,uint32)`.
    """
    x = np.asarray(x, dtype=np.uint32)
    y = np.asarray(y, dtype=np.uint32)
    M = np.uint32(0xFFFF)

    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)

    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d

    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = c ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = d ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))

    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = c ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = d ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))

    a, b, c, d = A, B, C, D
    C = c ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = d ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))

    a = C ^ (C >> 1)
    b = D ^ (D >> 1)

    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))

    i0 = (i0 | (i0 << 8)) & np.uint32(0x00FF00FF)
    i0 = (i0 | (i0 << 4)) & np.uint32(0x0F0F0F0F)
    i0 = (i0 | (i0 << 2)) & np.uint32(0x33333333)
    i0 = (i0 | (i0 << 1)) & np.uint32(0x55555555)

    i1 = (i1 | (i1 << 8)) & np.uint32(0x00FF00FF)
    i1 = (i1 | (i1 << 4)) & np.uint32(0x0F0F0F0F)
    i1 = (i1 | (i1 << 2)) & np.uint32(0x33333333)
    i1 = (i1 | (i1 << 1)) & np.uint32(0x55555555)

    return (i1 << 1) | i0


def hilbert_of_xy_f64(px, py, minx, miny, width, height):
    """Hilbert key of points in a world extent.

    Mirrors packedrtree.cpp:133-146 `hilbert(NodeItem&, ...)`: map the
    point (there: bbox center) to the HILBERT_MAX grid with
    floor(hilbertMax * (v - min) / extent), then index.  Degenerate
    extents map to grid 0 exactly like the reference.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if width != 0.0:
        gx = np.floor(HILBERT_MAX * (px - minx) / width).astype(np.uint32)
    else:
        gx = np.zeros(px.shape, dtype=np.uint32)
    if height != 0.0:
        gy = np.floor(HILBERT_MAX * (py - miny) / height).astype(np.uint32)
    else:
        gy = np.zeros(py.shape, dtype=np.uint32)
    return hilbert_u32(gx, gy)
