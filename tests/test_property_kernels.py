"""Hypothesis property tests for the round-2 kernels (no Spark —
pure-kernel invariants, the breadth layer of the test strategy)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.kernels import quantize as kq
from gdal_spark.kernels import viewshed as kvs
from gdal_spark.kernels import wkb as kwkb
from gdal_spark.operators.viewshed import _line_tiles
from gdal_spark.sources.shapefile import _shape_to_wkb, _wkb_to_shape


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(2, 12))
def test_median_cut_palette_bounds(seed, n_colors):
    rng = np.random.RandomState(seed % 2**31)
    rgb = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    h = np.zeros((32, 32, 32), dtype=np.int64)
    np.add.at(h, (rgb[..., 0].ravel() >> 3, rgb[..., 1].ravel() >> 3,
                  rgb[..., 2].ravel() >> 3), 1)
    pal = kq.median_cut(h, n_colors=n_colors)
    assert 1 <= len(pal) <= n_colors
    occ = np.argwhere(h > 0)
    for ch in range(3):
        lo, hi = occ[:, ch].min() << 3, (occ[:, ch].max() << 3) + 7
        assert (pal[:, ch] >= lo).all() and (pal[:, ch] <= hi + 1).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_dither_indices_in_palette(seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(rng.randint(2, 9), 3)).astype(np.uint8)
    rgb = rng.randint(0, 256, size=(10, 10, 3)).astype(np.uint8)
    out = kq.dither(rgb, pal)
    assert out.max() < len(pal)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_viewshed_monotone_in_observer_height(seed):
    """Raising the observer never hides a visible cell (edge mode):
    all relative heights drop by delta while every reference-plane
    recurrence has positive coefficients summing to >= 1."""
    rng = np.random.RandomState(seed)
    dem = rng.rand(15, 15) * rng.randint(1, 20)
    ox, oy = rng.randint(0, 15), rng.randint(0, 15)
    lo = kvs.viewshed(dem, ox, oy, observer_z=1.0)
    hi = kvs.viewshed(dem, ox, oy, observer_z=6.0)
    assert (hi >= lo).all()
    th = kvs.viewshed(dem, ox, oy, observer_z=1.0, target_height=10.0)
    assert (th >= lo).all()


class _RecordingDEM:
    """Terrain-0 DEM that records every (y, x) lookup."""
    def __init__(self):
        self.cells = []

    def __getitem__(self, yx):
        self.cells.append(yx)
        return 0.0


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 99), st.integers(0, 99),
       st.integers(0, 99), st.integers(0, 99),
       st.sampled_from([4, 16, 32]))
def test_los_walk_stays_inside_supercover(xa, ya, xb, yb, ts):
    """Every cell the Bresenham walk touches lies in the 1-px-padded
    segment supercover the operator fans out — the invariant that
    makes the line-tile gather sufficient."""
    rec = _RecordingDEM()
    kvs.line_of_sight(rec, xa, ya, 5.0, xb, yb, 5.0)
    tiles = _line_tiles(xa, ya, xb, yb, ts)
    for y, x in rec.cells:
        assert (x // ts, y // ts) in tiles, (x, y, ts)


_coord = st.floats(-1e5, 1e5, allow_nan=False).map(lambda v: round(v, 6))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_coord, _coord), min_size=2, max_size=12,
                unique=True))
def test_shapefile_linestring_roundtrip(coords):
    wkb = kwkb.wkb_linestring(np.array(coords, dtype=float))
    _stype, content = _wkb_to_shape(wkb)
    back = _shape_to_wkb(content)
    t, p = kwkb.parse_wkb(back)
    assert t == kwkb.LINESTRING
    np.testing.assert_array_equal(np.asarray(p), np.array(coords))


@settings(max_examples=40, deadline=None)
@given(st.tuples(_coord, _coord))
def test_shapefile_point_roundtrip(pt):
    wkb = kwkb.wkb_point(*pt)
    _stype, content = _wkb_to_shape(wkb)
    t, p = kwkb.parse_wkb(_shape_to_wkb(content))
    assert t == kwkb.POINT and p == pt


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(5, 25), st.integers(5, 25))
def test_viewshed_edge_fast_path_equals_generic(seed, h, w):
    """The vectorized edge-mode line is bit-identical to the generic
    sequential transcription (same arithmetic, different execution
    order only where cells are independent)."""
    rng = np.random.RandomState(seed)
    dem = (rng.rand(h, w) * rng.randint(1, 30)).round(3)
    ox, oy = rng.randint(0, w), rng.randint(0, h)
    oz = float(rng.rand() * 4)
    fast = kvs.viewshed(dem, ox, oy, observer_z=oz, cell_mode="edge")
    want = _serial_edge_viewshed(dem, ox, oy, oz)
    np.testing.assert_array_equal(fast, want)


def _serial_edge_viewshed(dem, ox, oy, oz):
    """Independent sequential transcription of the edge-mode sweep
    (duplicated here on purpose, as the test oracle)."""
    h_rows, w_cols = dem.shape
    zobs = float(dem[oy, ox]) + oz
    out = np.zeros((h_rows, w_cols))

    def setout(y, x, hl, z):
        out[y, x] = 0 if hl[x] < z else 255
        if z > hl[x]:
            hl[x] = z

    base = [float(v) - zobs for v in dem[oy]]
    out[oy, ox] = 255
    if ox - 1 >= 0:
        out[oy, ox - 1] = 255
        for x in range(ox - 2, -1, -1):
            setout(oy, x, base, kvs.calc_height_line(ox - x, base[x + 1]))
    if ox + 1 < w_cols:
        out[oy, ox + 1] = 255
        for x in range(ox + 2, w_cols):
            setout(oy, x, base, kvs.calc_height_line(x - ox, base[x - 1]))

    def line(y, last):
        m = abs(y - oy)
        hl = [float(v) - zobs for v in dem[y]]
        z = hl[ox] if m == 1 else kvs.calc_height_line(m, last[ox])
        setout(y, ox, hl, z)
        for x in range(ox - 1, -1, -1):
            nx = ox - x
            if nx == m:
                z = hl[x] if nx == 1 else kvs.calc_height_line(
                    nx, last[x + 1])
            elif nx >= m:
                z = kvs.calc_height_edge(m, nx, last[x + 1], hl[x + 1])
            else:
                z = kvs.calc_height_edge(nx, m, last[x + 1], last[x])
            setout(y, x, hl, z)
        for x in range(ox + 1, w_cols):
            nx = x - ox
            if nx == m:
                z = hl[x] if nx == 1 else kvs.calc_height_line(
                    nx, last[x - 1])
            elif nx >= m:
                z = kvs.calc_height_edge(m, nx, last[x - 1], hl[x - 1])
            else:
                z = kvs.calc_height_edge(nx, m, last[x - 1], last[x])
            setout(y, x, hl, z)
        return hl

    last = base
    for y in range(oy - 1, -1, -1):
        last = line(y, last)
    last = base
    for y in range(oy + 1, h_rows):
        last = line(y, last)
    return out.astype(np.uint8)


# ---- round-3 continuation kernels ----------------------------------------
from gdal_spark.kernels import geom as kgeom
from gdal_spark.kernels import s2 as ks2


@settings(max_examples=60, deadline=None)
@given(st.floats(-179.9, 179.9), st.floats(-84.9, 84.9),
       st.integers(1, 30))
def test_s2_prefix_is_parent(lon, lat, level):
    # parent-cell relation: level-k encoding == 2k-bit prefix of
    # level-30 — for EVERY point and level
    f30, p30 = ks2.s2_encode_lonlat(np.array([lon]), np.array([lat]))
    fk, pk = ks2.s2_encode_lonlat(np.array([lon]), np.array([lat]),
                                  level=level)
    assert fk[0] == f30[0]
    assert pk[0] == p30[0] >> (2 * (30 - level))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 5), st.integers(0, 2**30 - 1),
       st.integers(0, 2**30 - 1))
def test_s2_hilbert_bijection(face, i, j):
    pos = ks2.hilbert_pos(np.array([face]), np.array([i]), np.array([j]))
    i2, j2 = ks2.ij_from_pos(np.array([face]), pos)
    assert i2[0] == i and j2[0] == j


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 60), st.floats(-79.5, 79.5),
       st.floats(-2.9, 2.9))
def test_tmerc_roundtrip_any_zone(zone, lat, dlon):
    lon0 = -183.0 + 6.0 * zone
    lon = lon0 + dlon
    x, y = kgeom.tmerc_forward(np.array([lon]), np.array([lat]), lon0)
    lon2, lat2 = kgeom.tmerc_inverse(x, y, lon0)
    assert abs(lon2[0] - lon) < 1e-7 and abs(lat2[0] - lat) < 1e-7


@settings(max_examples=40, deadline=None)
@given(st.floats(-170, 166), st.floats(-75, 70),
       st.floats(0.05, 3.5), st.floats(0.05, 3.5),
       st.integers(5, 11))
def test_s2_cover_contains_center(cx, cy, w, h, level):
    cover = set(ks2.cover_bbox_lonlat(cx, cy, cx + w, cy + h, level)
                .tolist())
    f, p = ks2.s2_encode_lonlat(np.array([cx + w / 2.0]),
                                np.array([cy + h / 2.0]))
    assert int(ks2.cell_key(f, p, level)[0]) in cover


def test_s2_cover_face_straddle_sliver():
    """ADVICE r3: a box whose sliver crosses onto a neighboring cube
    face by less than one sample step must still be covered there —
    brute-force every cell of a dense in-box grid against the cover."""
    cases = [
        (44.90, 0.0, 45.001, 1.0, 8),    # equatorial face 0 -> 1 edge
        (-1.0, 44.90, 1.0, 45.0008, 8),  # face 0 -> polar face 2 edge
        (134.95, -0.5, 135.0009, 0.5, 9),  # face 1 -> 3 edge
        # cube corner (faces 0/1/2 meet at lon 45, lat atan(1/sqrt 2))
        (44.95, 35.20, 45.002, 35.2660, 7),
    ]
    for xmin, ymin, xmax, ymax, level in cases:
        cover = set(ks2.cover_bbox_lonlat(xmin, ymin, xmax, ymax, level)
                    .tolist())
        gx, gy = np.meshgrid(np.linspace(xmin, xmax, 160),
                             np.linspace(ymin, ymax, 160))
        f, p = ks2.s2_encode_lonlat(gx.ravel(), gy.ravel())
        keys = set(ks2.cell_key(f, p, level).tolist())
        missing = keys - cover
        assert not missing, (xmin, ymin, xmax, ymax, level, missing)
        assert len({k >> (2 * level) for k in keys}) >= 2  # straddles


# -------------------------------------------------- Z/M WKB roundtrip
_dims_strat = st.tuples(st.booleans(), st.booleans())


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**31 - 1), _dims_strat, st.integers(1, 4))
def test_wkb_zm_roundtrip_property(seed, zm, nparts):
    """encode -> parse_wkb_full is the identity for every geometry
    family at every Z/M width; parse_wkb projects to the same (x, y);
    batch_area/batch_length agree with the scalar kernels."""
    z, m = zm
    dims = 2 + z + m
    rng = np.random.RandomState(seed)
    from gdal_spark.kernels import batch_measures as bm

    # multilinestring
    parts = [rng.uniform(-100, 100, (rng.randint(2, 6), dims))
             for _ in range(nparts)]
    blob = kwkb.wkb_multilinestring(parts, z=z, m=m)
    base, hz, hm, got = kwkb.parse_wkb_full(blob)
    assert (base, hz, hm) == (kwkb.MULTILINESTRING, z, m)
    for a, b in zip(got, parts):
        np.testing.assert_array_equal(a, b)

    # polygon with hole, closed rings
    rings = []
    for _ in range(2):
        r = rng.uniform(-50, 50, (4, dims))
        rings.append(np.vstack([r, r[:1]]))
    pblob = kwkb.wkb_polygon(rings, z=z, m=m)
    base, hz, hm, got = kwkb.parse_wkb_full(pblob)
    assert (base, hz, hm) == (kwkb.POLYGON, z, m)
    np.testing.assert_array_equal(got[1], rings[1])

    # projection consistency: parse_wkb == parse_wkb_full[:, :2]
    t2, p2 = kwkb.parse_wkb(pblob)
    np.testing.assert_array_equal(p2[0], got[0][:, :2])

    # batch measures on the projected geometry match scalar kernels
    from gdal_spark.kernels import geom as kg
    a_batch = bm.batch_area([pblob])[0]
    a_scalar = kg.polygon_area([r[:, :2] for r in rings])
    assert abs(a_batch - a_scalar) < 1e-9 * max(1.0, abs(a_scalar))


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 5))
def test_wkb_collection_roundtrip_property(seed, n):
    """GeometryCollection nests arbitrary members and re-parses with
    tags intact; bbox equals the member-wise envelope union."""
    rng = np.random.RandomState(seed)
    members, want = [], []
    for i in range(n):
        k = rng.randint(3)
        if k == 0:
            x, y = rng.uniform(-10, 10, 2)
            members.append(kwkb.wkb_point(float(x), float(y)))
            want.append(kwkb.POINT)
        elif k == 1:
            members.append(kwkb.wkb_linestring(rng.uniform(-10, 10, (3, 2))))
            want.append(kwkb.LINESTRING)
        else:
            r = rng.uniform(-10, 10, (3, 2))
            members.append(kwkb.wkb_polygon([np.vstack([r, r[:1]])]))
            want.append(kwkb.POLYGON)
    gc = kwkb.wkb_collection(members)
    base, _, _, parts = kwkb.parse_wkb_full(gc)
    assert base == kwkb.GEOMETRYCOLLECTION
    assert [t for t, _ in parts] == want
    bb = kwkb.wkb_bbox(gc)
    sub = [kwkb.wkb_bbox(mb) for mb in members]
    assert bb == (min(s[0] for s in sub), min(s[1] for s in sub),
                  max(s[2] for s in sub), max(s[3] for s in sub))
