"""Batched WKB measure kernels: area / length / centroid over a whole
Arrow batch with ONE coordinate materialization.

The per-row path (parse_wkb per blob -> python float math) costs a
Python object tree per geometry.  Here the Python loop touches only
*headers* (a few struct.unpack_from per ring — O(rings), not
O(vertices)); every coordinate crosses into numpy via a single
``b"".join`` + ``np.frombuffer``, and the shoelace / segment-length /
centroid sums run as ``np.add.reduceat`` over ring-offset arrays.

Semantics match the scalar kernels (kernels/geom.py — themselves
anchored to OGRPolygon::get_Area / OGRLineString::get_Length /
Centroid, /root/reference/ogr/ogrgeometry.cpp).  The per-ring edge
terms are the same products; only the reduction order differs
(sequential ``reduceat`` vs slice ``sum``), so results agree exactly
on integer-valued coordinates and to float ulps otherwise.
"""

from __future__ import annotations

import struct

import numpy as np

from . import wkb as kw

# chain roles
_OUTER, _HOLE, _LINE, _POINT_CHAIN = 1, -1, 0, 2


def decode_chains_batch(blobs):
    """Decode an iterable of WKB blobs (None-safe) into flat arrays.

    Returns (coords, starts, counts, role, chain_geom, geom_type):
      coords     (N, 2) float64 — every 2-D vertex of every blob
      starts     (C,) int64    — chain start offsets into coords
      counts     (C,) int64    — vertices per chain
      role       (C,) int8     — _OUTER outer ring / _HOLE hole /
                                 _LINE linestring / _POINT_CHAIN point
      chain_geom (C,) int64    — row index of the chain's geometry
      geom_type  (G,) int32    — base WKB type per row (0 for NULL)

    Z/M blobs are projected to 2-D (matching parse_wkb); CircularString
    chains come out with role _LINE but are EXCLUDED from straight-line
    length by the caller via geom/part typing if needed.
    """
    bufs: list[bytes] = []
    counts: list[int] = []
    role: list[int] = []
    chain_geom: list[int] = []
    geom_type: list[int] = []

    fast = _decode_uniform(blobs)
    if fast is not None:
        return fast

    for gi, blob in enumerate(blobs):
        if blob is None:
            geom_type.append(0)
            continue
        b = bytes(blob)
        gt = _scan(memoryview(b), 0, gi, bufs, counts, role,
                   chain_geom, top=True)[1]
        geom_type.append(gt)

    if bufs:
        coords = np.frombuffer(b"".join(bufs), dtype="<f8")
        coords = coords.reshape(-1, 2)
    else:
        coords = np.empty((0, 2), dtype=np.float64)
    counts_a = np.asarray(counts, dtype=np.int64)
    starts = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts_a, out=starts[1:])
    return (coords, starts[:-1], counts_a,
            np.asarray(role, dtype=np.int8),
            np.asarray(chain_geom, dtype=np.int64),
            np.asarray(geom_type, dtype=np.int32))


def _decode_uniform(blobs):
    """Zero-per-row fast path: when every blob in the batch has the
    SAME byte layout (equal length, identical structural bytes —
    headers, ring counts, vertex counts; only coordinate payloads
    differ), the whole batch decodes as one (nblobs, L) uint8 matrix:
    blob 0's header walk yields the coordinate column ranges, a single
    equality check over the structural columns validates the layout,
    and each chain extracts as one strided slice.  This is the shape
    of real layers (fixed-vertex tiles, point layers, quads) — the
    header loop then costs O(chains-of-one-blob), not O(rows).
    Returns None when the batch is not uniform."""
    vals = blobs.tolist() if hasattr(blobs, "tolist") else list(blobs)
    n = len(vals)
    if n < 8 or vals[0] is None:
        return None
    try:
        first = bytes(vals[0])
        L = len(first)
        if L == 0:
            return None
        lens = np.fromiter(map(len, vals), dtype=np.int64, count=n)
        if (lens != L).any():
            return None
        joined = b"".join(vals)
    except TypeError:        # a None or non-buffer element
        return None

    # header-walk blob 0 only
    bufs0: list[bytes] = []
    counts0: list[int] = []
    role0: list[int] = []
    cg0: list[int] = []
    try:
        if first[0] != 1:
            return None
        spans = []          # (byte_start, nverts, dims) per chain
        _, gt0 = _scan_spans(first, 0, spans, counts0, role0)
    except (ValueError, struct.error):
        return None
    del bufs0, cg0

    mat = np.frombuffer(joined, dtype=np.uint8).reshape(n, L)
    cmask = np.zeros(L, dtype=bool)
    for s, nv, dims in spans:
        cmask[s:s + 8 * dims * nv] = True
    if not (mat[:, ~cmask] == mat[0, ~cmask]).all():
        return None

    per_blob = []
    for s, nv, dims in spans:
        if nv == 0:
            per_blob.append(np.empty((n, 0, 2), dtype=np.float64))
            continue
        block = np.ascontiguousarray(mat[:, s:s + 8 * dims * nv])
        xy = block.view("<f8").reshape(n, nv, dims)[:, :, :2]
        per_blob.append(xy)
    if per_blob:
        coords = np.concatenate(per_blob, axis=1).reshape(-1, 2)
        coords = np.ascontiguousarray(coords)
    else:
        coords = np.empty((0, 2), dtype=np.float64)

    nch = len(counts0)
    counts_a = np.tile(np.asarray(counts0, dtype=np.int64), n)
    starts = np.zeros(nch * n + 1, dtype=np.int64)
    np.cumsum(counts_a, out=starts[1:])
    return (coords, starts[:-1], counts_a,
            np.tile(np.asarray(role0, dtype=np.int8), n),
            np.repeat(np.arange(n, dtype=np.int64), nch),
            np.full(n, gt0, dtype=np.int32))


def _scan_spans(buf: bytes, off: int, spans, counts, role):
    """Like _scan but records (coord_byte_start, nverts, dims) spans
    instead of copying coordinate bytes (uniform-layout prepass)."""
    if buf[off] != 1:
        raise ValueError("big-endian")
    (raw,) = struct.unpack_from("<I", buf, off + 1)
    base, z, m = kw.decode_type(raw)
    dims = 2 + int(z) + int(m)
    step = 8 * dims
    off += 5
    if base == kw.POINT:
        spans.append((off, 1, dims))
        counts.append(1)
        role.append(_POINT_CHAIN)
        return off + step, base
    if base in (kw.LINESTRING, kw.CIRCULARSTRING):
        (nv,) = struct.unpack_from("<I", buf, off)
        spans.append((off + 4, nv, dims))
        counts.append(nv)
        role.append(_LINE)
        return off + 4 + step * nv, base
    if base in (kw.POLYGON, kw.TRIANGLE):
        (nr,) = struct.unpack_from("<I", buf, off)
        off += 4
        for r in range(nr):
            (nv,) = struct.unpack_from("<I", buf, off)
            spans.append((off + 4, nv, dims))
            counts.append(nv)
            role.append(_OUTER if r == 0 else _HOLE)
            off += 4 + step * nv
        return off, base
    if base in (kw.MULTIPOINT, kw.MULTILINESTRING, kw.MULTIPOLYGON,
                kw.POLYHEDRALSURFACE, kw.TIN, kw.GEOMETRYCOLLECTION,
                kw.MULTICURVE):
        (np_,) = struct.unpack_from("<I", buf, off)
        off += 4
        for _ in range(np_):
            off, _pt = _scan_spans(buf, off, spans, counts, role)
        return off, base
    raise ValueError(f"unsupported WKB geometry type {base}")


def _scan(buf: memoryview, off: int, gi: int, bufs, counts, role,
          chain_geom, top: bool):
    """Header-only walk; coordinate bytes are appended as views.
    Returns (next_offset, base_type)."""
    if buf[off] != 1:
        # big-endian blob: rare — materialize via the scalar parser
        return _scan_slow(buf, off, gi, bufs, counts, role, chain_geom)
    (raw,) = struct.unpack_from("<I", buf, off + 1)
    base, z, m = kw.decode_type(raw)
    dims = 2 + int(z) + int(m)
    step = 8 * dims
    off += 5
    if base == kw.POINT:
        _emit(buf, off, 1, dims, bufs)
        counts.append(1)
        role.append(_POINT_CHAIN)
        chain_geom.append(gi)
        return off + step, base
    if base in (kw.LINESTRING, kw.CIRCULARSTRING):
        (n,) = struct.unpack_from("<I", buf, off)
        _emit(buf, off + 4, n, dims, bufs)
        counts.append(n)
        role.append(_LINE)
        chain_geom.append(gi)
        return off + 4 + step * n, base
    if base in (kw.POLYGON, kw.TRIANGLE):
        (nr,) = struct.unpack_from("<I", buf, off)
        off += 4
        for r in range(nr):
            (n,) = struct.unpack_from("<I", buf, off)
            _emit(buf, off + 4, n, dims, bufs)
            counts.append(n)
            role.append(_OUTER if r == 0 else _HOLE)
            chain_geom.append(gi)
            off += 4 + step * n
        return off, base
    if base in (kw.MULTIPOINT, kw.MULTILINESTRING, kw.MULTIPOLYGON,
                kw.POLYHEDRALSURFACE, kw.TIN, kw.GEOMETRYCOLLECTION,
                kw.MULTICURVE):
        (np_,) = struct.unpack_from("<I", buf, off)
        off += 4
        for _ in range(np_):
            off, _pt = _scan(buf, off, gi, bufs, counts, role,
                             chain_geom, top=False)
        return off, base
    raise ValueError(f"unsupported WKB geometry type {base}")


def _emit(buf: memoryview, off: int, n: int, dims: int, bufs):
    if n == 0:
        return
    if dims == 2:
        bufs.append(bytes(buf[off:off + 16 * n]))
    else:
        a = np.frombuffer(buf, dtype="<f8", count=dims * n, offset=off)
        bufs.append(a.reshape(n, dims)[:, :2].tobytes())


def _scan_slow(buf, off, gi, bufs, counts, role, chain_geom):
    """Big-endian fallback through the scalar parser (rare)."""
    (base, _z, _m, payload), end = kw._parse_at(buf, off)
    proj = kw._project2d(base, payload)

    def emit(arr, r):
        a = np.ascontiguousarray(arr, dtype="<f8")
        bufs.append(a.tobytes())
        counts.append(a.shape[0])
        role.append(r)
        chain_geom.append(gi)

    def walk(t, p):
        if t == kw.POINT:
            emit(np.array([p]), _POINT_CHAIN)
        elif t in (kw.LINESTRING, kw.CIRCULARSTRING):
            emit(p, _LINE)
        elif t in (kw.POLYGON, kw.TRIANGLE):
            for r, ring in enumerate(p):
                emit(ring, _OUTER if r == 0 else _HOLE)
        elif t == kw.MULTIPOINT:
            for pt in p:
                emit(np.array([pt]), _POINT_CHAIN)
        elif t == kw.MULTILINESTRING:
            for part in p:
                emit(part, _LINE)
        else:
            for part in p:
                if isinstance(part, tuple):     # tagged (GC/MultiCurve)
                    walk(part[0], part[1])
                else:                           # multipolygon/PS/TIN
                    for r, ring in enumerate(part):
                        emit(ring, _OUTER if r == 0 else _HOLE)

    walk(base, proj)
    return end, base


def _chain_sums(vals: np.ndarray, starts: np.ndarray,
                counts: np.ndarray) -> np.ndarray:
    """Per-chain sums of a per-edge array ``vals`` (length N-1, edge i
    connects vertex i and i+1).  Edges crossing chain boundaries are
    excluded."""
    if len(counts) == 0:
        return np.zeros(0, dtype=np.float64)
    # two pads: ``vals`` has N-1 edge terms for N vertices, and a chain
    # that is EMPTY and LAST has starts[-1] == N — reduceat needs that
    # index to be in range, so v must reach length N+1 (a single pad
    # only covers the spurious-boundary-edge slot at N-1).
    v = np.concatenate([vals, (0.0, 0.0)])
    # chain k's spurious boundary edge (last vertex -> next chain's
    # first vertex) sits at starts[k] + counts[k] - 1; zero it BEFORE
    # the reduceat so per-chain sums contain only valid terms —
    # subtracting after the fold would break exactness
    # ((a + s) - s != a in floats).  Empty chains have no edge; the
    # final chain's index lands on the 0.0 pad.
    sp = (starts + counts - 1)[counts > 0]
    v[sp] = 0.0
    out = np.add.reduceat(v, starts)
    out[counts < 2] = 0.0
    return out


def batch_area_spheroid(blobs, radius: float) -> np.ndarray:
    """Batched twin of geom.geodesic_ring_area composed per the scalar
    _st_area_spheroid contract: POLYGON rows only (|outer| - sum|holes|
    on the authalic sphere of ``radius``), 0.0 for every other type and
    NULL.  Per-edge Chamberlain & Duquette terms, one trig pass over
    the whole batch, per-ring fold via _chain_sums."""
    coords, starts, counts, role, cgeom, gtypes = decode_chains_batch(blobs)
    if len(cgeom) == 0:
        return np.zeros(len(gtypes))
    lon = np.radians(coords[:, 0])
    lat = np.radians(coords[:, 1])
    slat = np.sin(lat)
    term = (lon[1:] - lon[:-1]) * (2.0 + slat[1:] + slat[:-1])
    ring_s = _chain_sums(term, starts, counts)
    ring_area = np.abs(ring_s) / 2.0 * radius * radius
    sign = np.where(role == _OUTER, 1.0, -1.0)
    areal = (role == _OUTER) | (role == _HOLE)
    want = gtypes == kw.POLYGON
    contrib = np.where(areal & want[cgeom], sign * ring_area, 0.0)
    return np.bincount(cgeom, weights=contrib,
                       minlength=len(gtypes)).astype(np.float64)


def batch_length_spheroid(blobs, radius: float) -> np.ndarray:
    """Batched twin of geom.geodesic_length per the scalar
    _st_length_spheroid contract: LINESTRING rows only (haversine
    great-circle chain length, m), 0.0 otherwise."""
    coords, starts, counts, role, cgeom, gtypes = decode_chains_batch(blobs)
    if len(cgeom) == 0:
        return np.zeros(len(gtypes))
    lon = np.radians(coords[:, 0])
    lat = np.radians(coords[:, 1])
    dlon = lon[1:] - lon[:-1]
    dlat = lat[1:] - lat[:-1]
    h = (np.sin(dlat / 2.0) ** 2
         + np.cos(lat[:-1]) * np.cos(lat[1:]) * np.sin(dlon / 2.0) ** 2)
    term = np.arcsin(np.sqrt(h))
    chain_s = _chain_sums(term, starts, counts)
    lineal = role == _LINE
    want = gtypes == kw.LINESTRING
    contrib = np.where(lineal & want[cgeom],
                       2.0 * radius * chain_s, 0.0)
    return np.bincount(cgeom, weights=contrib,
                       minlength=len(gtypes)).astype(np.float64)


def batch_area(blobs) -> np.ndarray:
    """OGRPolygon::get_Area per blob: |outer| - sum|holes|, summed over
    multi parts; 0.0 for non-areal types and NULL."""
    coords, starts, counts, role, cgeom, gtypes = decode_chains_batch(blobs)
    x, y = coords[:, 0], coords[:, 1]
    cr = x[:-1] * y[1:] - x[1:] * y[:-1]
    ring_cross = _chain_sums(cr, starts, counts)
    areal = (role == _OUTER) | (role == _HOLE)
    sign = np.where(role == _OUTER, 1.0, -1.0)
    contrib = np.where(areal, sign * np.abs(ring_cross / 2.0), 0.0)
    return np.bincount(cgeom, weights=contrib,
                       minlength=len(gtypes)).astype(np.float64) \
        if len(cgeom) else np.zeros(len(gtypes))


def batch_length(blobs) -> np.ndarray:
    """OGRLineString::get_Length per blob over LINESTRING /
    MULTILINESTRING (straight chains only); 0.0 otherwise."""
    coords, starts, counts, role, cgeom, gtypes = decode_chains_batch(blobs)
    d = np.diff(coords, axis=0)
    seg = np.sqrt((d * d).sum(axis=1))
    chain_len = _chain_sums(seg, starts, counts)
    lineal = role == _LINE
    want = np.isin(gtypes, (kw.LINESTRING, kw.MULTILINESTRING))
    contrib = np.where(lineal & want[cgeom], chain_len, 0.0) \
        if len(cgeom) else chain_len
    return np.bincount(cgeom, weights=contrib,
                       minlength=len(gtypes)).astype(np.float64) \
        if len(cgeom) else np.zeros(len(gtypes))


def batch_centroid(blobs):
    """Centroid per blob, matching the scalar _st_centroid contract:
    POINT -> itself, POLYGON -> area-weighted outer-ring centroid
    (mean fallback for zero area), LINESTRING -> vertex mean, other
    types/NULL -> None.  Returns (cx, cy, ok) float64/bool arrays."""
    coords, starts, counts, role, cgeom, gtypes = decode_chains_batch(blobs)
    G = len(gtypes)
    cx = np.full(G, np.nan)
    cy = np.full(G, np.nan)
    ok = np.zeros(G, dtype=bool)
    if len(cgeom) == 0:
        return cx, cy, ok
    x, y = coords[:, 0], coords[:, 1]
    cr = x[:-1] * y[1:] - x[1:] * y[:-1]
    ring_cross = _chain_sums(cr, starts, counts)
    cx_num = _chain_sums((x[:-1] + x[1:]) * cr, starts, counts)
    cy_num = _chain_sums((y[:-1] + y[1:]) * cr, starts, counts)
    # vertex means per chain (linestring + zero-area fallback)
    mx = np.add.reduceat(np.append(x, 0.0), starts)
    my = np.add.reduceat(np.append(y, 0.0), starts)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_x = mx / counts
        mean_y = my / counts

    # first chain of each geometry (outer ring / the line / the point)
    first = np.ones(len(cgeom), dtype=bool)
    first[1:] = cgeom[1:] != cgeom[:-1]
    fidx = np.nonzero(first)[0]
    fgeom = cgeom[fidx]
    a2 = ring_cross[fidx]            # 2*signed area of the first chain

    for sel_type, kind in ((kw.POINT, "pt"), (kw.LINESTRING, "mean"),
                           (kw.POLYGON, "poly")):
        # EMPTY geometries (first chain has no vertices) have no
        # centroid — scalar contract returns None, so ok stays False
        mask = (gtypes[fgeom] == sel_type) & (counts[fidx] > 0)
        if not mask.any():
            continue
        gi = fgeom[mask]
        ci = fidx[mask]
        if kind == "pt":
            cx[gi] = x[starts[ci]]
            cy[gi] = y[starts[ci]]
        elif kind == "mean":
            cx[gi] = mean_x[ci]
            cy[gi] = mean_y[ci]
        else:
            a = a2[mask] / 2.0
            with np.errstate(invalid="ignore", divide="ignore"):
                px = cx_num[ci] / (6.0 * a)
                py = cy_num[ci] / (6.0 * a)
            zero = a == 0.0
            px = np.where(zero, mean_x[ci], px)
            py = np.where(zero, mean_y[ci], py)
            cx[gi] = px
            cy[gi] = py
        ok[gi] = True
    return cx, cy, ok


def batch_bbox(blobs):
    """Per-blob 2-D bounding boxes in ONE coordinate pass.

    Returns (minx, miny, maxx, maxy) float64 arrays, NaN for NULL or
    empty geometries.  The batch analogue of kw.wkb_bbox — used as the
    vectorized prefilter in front of the per-pair overlay kernel
    (bbox-disjoint pairs never reach Python geometry)."""
    coords, starts, counts, role, cgeom, gtypes = decode_chains_batch(blobs)
    G = len(gtypes)
    minx = np.full(G, np.nan)
    miny = np.full(G, np.nan)
    maxx = np.full(G, np.nan)
    maxy = np.full(G, np.nan)
    if len(cgeom) == 0 or len(coords) == 0:
        return minx, miny, maxx, maxy
    # vertices arrive grouped by geometry (chains are emitted in row
    # order), so per-geometry extremes are one reduceat over the
    # first-vertex offsets of each geometry that has any vertex
    vgeom = np.repeat(cgeom, counts)
    if len(vgeom) == 0:
        return minx, miny, maxx, maxy
    first = np.ones(len(vgeom), dtype=bool)
    first[1:] = vgeom[1:] != vgeom[:-1]
    gstarts = np.nonzero(first)[0]
    gids = vgeom[gstarts]
    x, y = coords[:, 0], coords[:, 1]
    minx[gids] = np.minimum.reduceat(x, gstarts)
    miny[gids] = np.minimum.reduceat(y, gstarts)
    maxx[gids] = np.maximum.reduceat(x, gstarts)
    maxy[gids] = np.maximum.reduceat(y, gstarts)
    return minx, miny, maxx, maxy


def encode_polygons_uniform(rings: np.ndarray) -> list[bytes]:
    """(n, nv, 2) float64 -> n single-ring Polygon WKB blobs via one
    matrix write: every blob shares the identical 13-byte header
    (endian, type 3, 1 ring, nv vertices), so the batch encodes as one
    uint8 matrix fill + one tobytes — the inverse of _decode_uniform.
    Byte-identical to kw.wkb_polygon([ring]) per row."""
    n, nv, two = rings.shape
    assert two == 2
    header = struct.pack("<BIII", 1, kw.POLYGON, 1, nv)
    hl = len(header)
    L = hl + 16 * nv
    mat = np.empty((n, L), dtype=np.uint8)
    mat[:, :hl] = np.frombuffer(header, dtype=np.uint8)
    cb = np.ascontiguousarray(rings, dtype="<f8") \
        .reshape(n, 2 * nv).view(np.uint8)
    mat[:, hl:] = cb
    blob = mat.tobytes()
    return [blob[i * L:(i + 1) * L] for i in range(n)]
