"""S2 cell-id encoding, numpy-vectorized (public S2 geometry spec).

The baseline's north star calls for "vectorized H3/S2 cell encoding
... executed as Arrow-backed pandas UDFs".  This kernel implements the
S2 scheme from the public specification (s2geometry.io; Google's
S2CellId::FromFaceIJ definition): project the direction vector onto
one of 6 cube faces, apply the quadratic UV->ST transform, quantize to
a 2^level grid, and walk the per-level Hilbert state machine to get
the position along the space-filling curve.  All arrays, no per-row
Python; the 30-level loop is 30 vectorized numpy passes.

The reference reaches the same need through quadtree tiles + Hilbert
keys (/root/reference/gcore/overview rollups; our
operators/partitioning.py); S2 adds the sphere-native variant.

We expose (face, pos) rather than the packed uint64 id: Spark longs
are signed, and face >= 4 would wrap the sign bit; (face:int,
pos:<2^(2*level)) is the same bijection without int64 overflow, and
``token = printf('%d%015x', face, pos)`` is a stable string key both
engines format identically.
"""

from __future__ import annotations

import numpy as np

# Hilbert traversal tables (S2 spec): for each orientation (bit0 =
# swap axes, bit1 = invert bits), the curve position of each ij
# sub-quadrant, and the orientation delta each position applies.
KIJ_TO_POS = np.array([
    [0, 1, 3, 2],   # canonical order (0,0) (0,1) (1,1) (1,0)
    [0, 3, 1, 2],   # axes swapped
    [2, 3, 1, 0],   # bits inverted
    [2, 1, 3, 0],   # swapped & inverted
], dtype=np.int64)
KPOS_TO_IJ = np.array([
    [0, 1, 3, 2],
    [0, 2, 3, 1],
    [3, 2, 0, 1],
    [3, 1, 0, 2],
], dtype=np.int64)
KPOS_TO_ORIENTATION = np.array([1, 0, 0, 3], dtype=np.int64)

MAX_LEVEL = 30


def face_uv_from_xyz(x, y, z):
    """Largest-abs-component face selection + per-face UV ratios
    (S2::GetFace / ValidFaceXYZtoUV).  Scale-invariant: callers may
    pass unnormalized direction vectors."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = axis + np.where(comp < 0.0, 3, 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y], default=-y / z)
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y], default=-x / z)
    return face.astype(np.int64), u, v


def st_from_uv(u):
    """Quadratic projection (S2: STtoUV inverse), u in [-1,1] -> [0,1]."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        # np.where evaluates both branches; each sqrt is only read
        # where its argument is non-negative.
        return np.where(u >= 0.0,
                        0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def ij_from_st(s, level=MAX_LEVEL):
    n = 1 << level
    return np.clip(np.floor(np.asarray(s) * n).astype(np.int64), 0, n - 1)


def hilbert_pos(face, i, j, level=MAX_LEVEL):
    """Position along the face's Hilbert curve at ``level`` (the
    definitional per-level recurrence of S2CellId::FromFaceIJ;
    initial orientation = face & 1 per the spec)."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    orient = face & 1
    pos = np.zeros_like(i)
    for k in range(level - 1, -1, -1):
        ijb = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        pb = KIJ_TO_POS[orient, ijb]
        pos = pos * 4 + pb
        orient = orient ^ KPOS_TO_ORIENTATION[pb]
    return pos


def ij_from_pos(face, pos, level=MAX_LEVEL):
    """Inverse walk (test support): curve position -> (i, j)."""
    face = np.asarray(face, dtype=np.int64)
    pos = np.asarray(pos, dtype=np.int64)
    orient = face & 1
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(level - 1, -1, -1):
        pb = (pos >> (2 * k)) & 3
        ijb = KPOS_TO_IJ[orient, pb]
        i = i * 2 + (ijb >> 1)
        j = j * 2 + (ijb & 1)
        orient = orient ^ KPOS_TO_ORIENTATION[pb]
    return i, j


def s2_encode_xyz(x, y, z, level=MAX_LEVEL):
    """Direction vectors -> (face, hilbert pos).  Pure IEEE ops
    (ratios, sqrt, floor), so any engine computing the same formula
    chain over the same doubles produces identical cells."""
    face, u, v = face_uv_from_xyz(x, y, z)
    i = ij_from_st(st_from_uv(u), level)
    j = ij_from_st(st_from_uv(v), level)
    return face, hilbert_pos(face, i, j, level)


def s2_encode_lonlat(lon_deg, lat_deg, level=MAX_LEVEL):
    """Degrees -> (face, pos) via the unit sphere."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cl = np.cos(lat)
    return s2_encode_xyz(cl * np.cos(lon), cl * np.sin(lon), np.sin(lat),
                         level)


def cell_key(face, pos, level):
    """Pack (face, level-30 pos) into one int64 key at ``level``:
    face * 4^level + (pos >> 2*(30-level)).  Monotone in the curve
    order within a face; fits signed 64 for level <= 28."""
    face = np.asarray(face, dtype=np.int64)
    pos = np.asarray(pos, dtype=np.int64)
    return face * (1 << (2 * level)) + (pos >> (2 * (MAX_LEVEL - level)))


def uv_from_st(s):
    """Inverse of st_from_uv: [0,1] -> [-1,1] (S2: STtoUV)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5,
                    (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def _face_uv_to_xyz(face, u, v):
    """Direction vector of (face, u, v) — the per-face frame inverse
    of face_uv_from_xyz's ratios.  |u| or |v| beyond 1 is allowed and
    yields a direction on a NEIGHBORING face."""
    one = np.ones_like(np.asarray(u, dtype=np.float64))
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    if face == 0:
        return one, u, v
    if face == 1:
        return -u, one, v
    if face == 2:
        return -u, -v, one
    if face == 3:
        return -one, -v, -u
    if face == 4:
        return v, -one, -u
    return v, u, -one


def cover_bbox_lonlat(xmin, ymin, xmax, ymax, level, samples=17,
                      max_cells=16384):
    """Level-``level`` S2 cells covering a lon/lat box — the candidate
    generator for the S2-keyed spatial join (overcoverage is fine, the
    exact PIP phase filters; undercoverage is bounded below).

    Method: encode a ``samples`` x ``samples`` boundary-inclusive grid
    of the box, group hits per face, take the ij hull per face,
    DILATE BY ONE CELL, enumerate.  The true ij extent of the box can
    exceed the sampled hull only by the projection's deviation across
    one sample step — for boxes up to a few degrees that is far under
    one level<=12 cell, which the dilation absorbs (brute-force
    asserted in tests/test_s2.py).

    Face straddles (ADVICE r3): a box sliver crossing onto a
    neighboring cube face by less than one sample step gets no grid
    samples there.  Whenever a face hull's dilation reaches the face
    edge, probe points are placed just ACROSS that edge (|uv| = 1 +
    half a neighbor cell) along the hull's span — plus the diagonal
    corner when two edges are touched — and fed through the same
    encode + hull + dilate path, so the neighbor face's edge band is
    enumerated.  Under the same one-sample-step deviation bound the
    sliver is under one cell deep, which probe + dilation covers.
    """
    ss = np.linspace(0.0, 1.0, samples)
    gx, gy = np.meshgrid(xmin + ss * (xmax - xmin),
                         ymin + ss * (ymax - ymin))
    face, pos = s2_encode_lonlat(gx.ravel(), gy.ravel(), MAX_LEVEL)
    n = 1 << level
    shift = MAX_LEVEL - level

    def _hulls(face_arr, pos_arr):
        out = {}
        for f in np.unique(face_arr):
            m = face_arr == f
            i, j = ij_from_pos(np.full(m.sum(), f), pos_arr[m], MAX_LEVEL)
            il = np.clip(i >> shift, 0, n - 1)
            jl = np.clip(j >> shift, 0, n - 1)
            out[int(f)] = (int(il.min()), int(il.max()),
                           int(jl.min()), int(jl.max()))
        return out

    hulls = _hulls(face, pos)

    # Cross-edge probes for face-straddling boxes.
    probes = []
    outset = 1.0 + 4.0 / (3.0 * n)   # middle of the neighbor edge cell
    for f, (ilo, ihi, jlo, jhi) in hulls.items():
        lo_i, hi_i = ilo <= 1, ihi >= n - 2
        lo_j, hi_j = jlo <= 1, jhi >= n - 2
        # half-cell-spaced ST samples along the touched span (+1 cell
        # margin each way, clipped to the face)
        si = np.arange(max(ilo - 1, 0) * 2,
                       (min(ihi + 1, n - 1) + 1) * 2 + 1) / (2.0 * n)
        sj = np.arange(max(jlo - 1, 0) * 2,
                       (min(jhi + 1, n - 1) + 1) * 2 + 1) / (2.0 * n)
        ui, vj = uv_from_st(si), uv_from_st(sj)
        if lo_i:
            probes.append(_face_uv_to_xyz(f, np.full_like(vj, -outset), vj))
        if hi_i:
            probes.append(_face_uv_to_xyz(f, np.full_like(vj, outset), vj))
        if lo_j:
            probes.append(_face_uv_to_xyz(f, ui, np.full_like(ui, -outset)))
        if hi_j:
            probes.append(_face_uv_to_xyz(f, ui, np.full_like(ui, outset)))
        for touched, cu, cv in ((lo_i and lo_j, -outset, -outset),
                                (lo_i and hi_j, -outset, outset),
                                (hi_i and lo_j, outset, -outset),
                                (hi_i and hi_j, outset, outset)):
            if touched:
                probes.append(_face_uv_to_xyz(f, np.array([cu]),
                                              np.array([cv])))
    if probes:
        px = np.concatenate([p[0] for p in probes])
        py = np.concatenate([p[1] for p in probes])
        pz = np.concatenate([p[2] for p in probes])
        pf, pp = s2_encode_xyz(px, py, pz, MAX_LEVEL)
        face = np.concatenate([face, pf])
        pos = np.concatenate([pos, pp])
        hulls = _hulls(face, pos)

    keys = []
    for f, (ilo, ihi, jlo, jhi) in hulls.items():
        i0, i1 = max(ilo - 1, 0), min(ihi + 1, n - 1)
        j0, j1 = max(jlo - 1, 0), min(jhi + 1, n - 1)
        if (i1 - i0 + 1) * (j1 - j0 + 1) > max_cells:
            raise ValueError(
                f"covering too fine: {(i1-i0+1)*(j1-j0+1)} cells at "
                f"level {level}; choose a coarser level")
        ii, jj = np.mgrid[i0:i1 + 1, j0:j1 + 1]
        p = hilbert_pos(np.full(ii.size, f), ii.ravel(), jj.ravel(), level)
        keys.append(np.int64(f) * (1 << (2 * level)) + p)
    return np.unique(np.concatenate(keys)) if keys else \
        np.empty(0, dtype=np.int64)
