"""Batched area/length/centroid kernels vs the scalar kernels on
randomized geometry mixes (kernels/batch_measures.py)."""

import numpy as np
import pytest

from gdal_spark.kernels import batch_measures as bm
from gdal_spark.kernels import geom as kgeom
from gdal_spark.kernels import wkb as kw


def _rand_ring(rng, n, cx, cy, r):
    th = np.sort(rng.uniform(0, 2 * np.pi, n))
    pts = np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], axis=1)
    return np.vstack([pts, pts[:1]])


def _mixed_blobs(seed=0, n=200):
    rng = np.random.default_rng(seed)
    blobs = []
    for i in range(n):
        k = i % 7
        if k == 0:
            blobs.append(kw.wkb_point(rng.uniform(-10, 10),
                                      rng.uniform(-10, 10)))
        elif k == 1:
            blobs.append(kw.wkb_linestring(
                rng.uniform(-10, 10, (rng.integers(2, 9), 2))))
        elif k == 2:
            outer = _rand_ring(rng, 8, 0, 0, 5.0)
            hole = _rand_ring(rng, 5, 0, 0, 1.0)
            blobs.append(kw.wkb_polygon([outer, hole]))
        elif k == 3:
            blobs.append(kw.wkb_multipolygon(
                [[_rand_ring(rng, 6, 0, 0, 3.0)],
                 [_rand_ring(rng, 7, 20, 0, 2.0),
                  _rand_ring(rng, 5, 20, 0, 0.5)]]))
        elif k == 4:
            blobs.append(kw.wkb_multilinestring(
                [rng.uniform(-5, 5, (3, 2)), rng.uniform(-5, 5, (4, 2))]))
        elif k == 5:
            blobs.append(None)
        else:
            blobs.append(kw.wkb_multipoint(
                [tuple(p) for p in rng.uniform(-5, 5, (3, 2))]))
    return blobs


def _scalar_area(b):
    if b is None:
        return 0.0
    t, p = kw.parse_wkb(b)
    if t == kw.POLYGON:
        return kgeom.polygon_area(p)
    if t == kw.MULTIPOLYGON:
        return sum(kgeom.polygon_area(r) for r in p)
    return 0.0


def _scalar_length(b):
    if b is None:
        return 0.0
    t, p = kw.parse_wkb(b)
    parts = [p] if t == kw.LINESTRING else (
        p if t == kw.MULTILINESTRING else [])
    tot = 0.0
    for part in parts:
        d = np.diff(part, axis=0)
        tot += float(np.sqrt((d * d).sum(axis=1)).sum())
    return tot


def test_area_matches_scalar():
    blobs = _mixed_blobs()
    got = bm.batch_area(blobs)
    for i, b in enumerate(blobs):
        assert got[i] == pytest.approx(_scalar_area(b), rel=1e-12, abs=1e-12)


def test_length_matches_scalar():
    blobs = _mixed_blobs(seed=1)
    got = bm.batch_length(blobs)
    for i, b in enumerate(blobs):
        assert got[i] == pytest.approx(_scalar_length(b), rel=1e-12,
                                       abs=1e-12)


def test_centroid_matches_scalar():
    blobs = _mixed_blobs(seed=2)
    cx, cy, ok = bm.batch_centroid(blobs)
    for i, b in enumerate(blobs):
        if b is None:
            assert not ok[i]
            continue
        t, p = kw.parse_wkb(b)
        if t == kw.POINT:
            assert ok[i] and (cx[i], cy[i]) == (p[0], p[1])
        elif t == kw.LINESTRING:
            assert ok[i]
            assert cx[i] == pytest.approx(p[:, 0].mean(), rel=1e-12)
            assert cy[i] == pytest.approx(p[:, 1].mean(), rel=1e-12)
        elif t == kw.POLYGON:
            rx, ry = kgeom.ring_centroid(p[0])
            assert ok[i]
            assert cx[i] == pytest.approx(rx, rel=1e-12)
            assert cy[i] == pytest.approx(ry, rel=1e-12)
        else:
            assert not ok[i]


def test_area_covers_triangle_tin_gc():
    tri = [np.array([[0, 0], [4, 0], [0, 3], [0, 0]], dtype=np.float64)]
    t = kw.wkb_triangle(tri)
    tin = kw.wkb_collection([t, t], base=kw.TIN)
    gc = kw.wkb_collection([kw.wkb_polygon(tri), kw.wkb_point(1.0, 1.0)])
    got = bm.batch_area([t, tin, gc])
    assert got[0] == 6.0 and got[1] == 12.0 and got[2] == 6.0


def test_z_blobs_project():
    ring = np.array([[0, 0, 9], [2, 0, 9], [2, 2, 9], [0, 2, 9], [0, 0, 9]],
                    dtype=np.float64)
    assert bm.batch_area([kw.wkb_polygon([ring], z=True)])[0] == 4.0
    ls = np.array([[0, 0, 1], [3, 4, 2]], dtype=np.float64)
    assert bm.batch_length([kw.wkb_linestring(ls, z=True)])[0] == 5.0


def test_degenerate_chains():
    # empty linestring, single-vertex line, zero-area polygon
    empty = kw.wkb_linestring(np.empty((0, 2)))
    single = kw.wkb_linestring(np.array([[1.0, 2.0]]))
    flat = kw.wkb_polygon([np.array([[0, 0], [1, 0], [2, 0], [0, 0]],
                                    dtype=np.float64)])
    assert bm.batch_length([empty, single]).tolist() == [0.0, 0.0]
    assert bm.batch_area([flat])[0] == 0.0
    cx, cy, ok = bm.batch_centroid([flat])
    assert ok[0] and cx[0] == pytest.approx(0.75) \
        and cy[0] == pytest.approx(0.0)


def test_big_endian_fallback():
    import struct
    # hand-build a BE polygon: square 2x2
    ring = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    body = struct.pack(">BII", 0, 3, 1) + struct.pack(">I", 5)
    for x, y in ring:
        body += struct.pack(">dd", float(x), float(y))
    assert bm.batch_area([body])[0] == 4.0


def test_uniform_fast_path_matches_generic():
    """A uniform-layout batch takes the matrix fast path; forcing the
    generic header loop (by breaking uniformity with one extra blob)
    must give identical values."""
    rng = np.random.default_rng(7)
    blobs = []
    for i in range(64):
        ring = np.vstack([rng.uniform(-9, 9, (4, 2))] * 1)
        ring = np.vstack([ring, ring[:1]])
        blobs.append(kw.wkb_polygon([ring]))
    assert bm._decode_uniform(blobs) is not None
    uni = bm.batch_area(blobs)
    # odd blob out -> generic loop for the whole batch
    mixed = blobs + [kw.wkb_point(0.0, 0.0)]
    assert bm._decode_uniform(mixed) is None
    gen = bm.batch_area(mixed)
    np.testing.assert_allclose(uni, gen[:64], rtol=1e-12)

    ulen = bm.batch_length([kw.wkb_linestring(rng.uniform(0, 1, (3, 2)))
                            for _ in range(32)])
    assert (ulen > 0).all()


def test_uniform_fast_path_rejects_nulls_and_small():
    blobs = [kw.wkb_point(1.0, 2.0)] * 64
    assert bm._decode_uniform(blobs) is not None
    assert bm._decode_uniform(blobs[:4]) is None          # tiny batch
    assert bm._decode_uniform([None] + blobs[1:]) is None  # leading null
    assert bm._decode_uniform(blobs[:-1] + [None]) is None  # trailing null


def test_uniform_fast_path_multipolygon_z():
    ring = np.array([[0, 0, 1], [2, 0, 1], [2, 2, 1], [0, 2, 1], [0, 0, 1]],
                    dtype=np.float64)
    blobs = [kw.wkb_multipolygon([[ring + i], [ring + 10 + i]], z=True)
             for i in range(16)]
    assert bm._decode_uniform(blobs) is not None
    np.testing.assert_allclose(bm.batch_area(blobs), 8.0)


def test_empty_chain_in_final_position():
    """A valid EMPTY geometry as the last row of a batch must not kill
    the kernel (reduceat index == len(v) regression): the scalar path
    returns 0.0/None for empties, and the batch path must agree."""
    full = kw.wkb_linestring(np.array([[0.0, 0.0], [3.0, 4.0]]))
    empty_ls = kw.wkb_linestring(np.empty((0, 2)))
    empty_poly = kw.wkb_polygon([])
    got = bm.batch_length([full, empty_ls])
    np.testing.assert_allclose(got, [5.0, 0.0])
    got = bm.batch_area([kw.wkb_polygon(
        [np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)]),
        empty_poly])
    np.testing.assert_allclose(got, [4.0, 0.0])
    cx, cy, ok = bm.batch_centroid([full, empty_ls])
    assert ok[0] and not ok[1]
    np.testing.assert_allclose([cx[0], cy[0]], [1.5, 2.0])
    # empty-only batch and empty mid-batch
    np.testing.assert_allclose(bm.batch_length([empty_ls]), [0.0])
    got = bm.batch_length([empty_ls, full, empty_ls])
    np.testing.assert_allclose(got, [0.0, 5.0, 0.0])


def test_multipoint_m_member_headers():
    """wkb_multipoint(m=True) members must be tagged 2001 (PointM) on
    the wire, not 1001 (PointZ) — external readers decode member
    headers, not the container's."""
    import struct
    mp = kw.wkb_multipoint([(1.0, 2.0, 9.0)], m=True)
    # container header (5) + count (4), then member header
    (member_type,) = struct.unpack_from("<I", mp, 5 + 4 + 1)
    assert member_type == 2001
    mpz = kw.wkb_multipoint([(1.0, 2.0, 9.0)], z=True)
    (member_type,) = struct.unpack_from("<I", mpz, 5 + 4 + 1)
    assert member_type == 1001
    mpzm = kw.wkb_multipoint([(1.0, 2.0, 9.0, 8.0)], z=True, m=True)
    (member_type,) = struct.unpack_from("<I", mpzm, 5 + 4 + 1)
    assert member_type == 3001
    base, hz, hm, pts = kw.parse_wkb_full(mpzm)
    assert (base, hz, hm) == (kw.MULTIPOINT, True, True)
    assert list(pts[0]) == [1.0, 2.0, 9.0, 8.0]


def test_batch_bbox_matches_scalar():
    """batch_bbox vs kw.wkb_bbox per blob on the mixed battery; NULL
    and EMPTY rows come back all-NaN (so any bbox comparison is
    False -> the overlay prefilter yields None, matching the kernel)."""
    base = _mixed_blobs(seed=7)
    blobs = base + [
        kw.wkb_linestring(np.empty((0, 2))), kw.wkb_polygon([]), None]
    minx, miny, maxx, maxy = bm.batch_bbox(blobs)
    for i, b in enumerate(base):
        if b is None:
            assert np.isnan(minx[i]) and np.isnan(maxy[i])
            continue
        ref = kw.wkb_bbox(b)
        np.testing.assert_allclose(
            [minx[i], miny[i], maxx[i], maxy[i]], list(ref))
    for i in range(len(base), len(blobs)):   # EMPTY x2, NULL
        assert np.isnan(minx[i]) and np.isnan(miny[i])
        assert np.isnan(maxx[i]) and np.isnan(maxy[i])


def test_encode_polygons_uniform_bitmatch():
    """encode_polygons_uniform bytes == kw.wkb_polygon per ring."""
    rng = np.random.default_rng(3)
    rings = rng.uniform(-10, 10, (5, 9, 2))
    rings[:, -1, :] = rings[:, 0, :]
    got = bm.encode_polygons_uniform(rings)
    for i in range(5):
        assert got[i] == kw.wkb_polygon([rings[i]])


def test_spheroid_batch_matches_scalar():
    """batch_area_spheroid / batch_length_spheroid vs the scalar
    geodesic kernels under the _st_*_spheroid contract: POLYGON-only
    area (holes subtract), LINESTRING-only length, 0.0 for every other
    type / NULL, and an empty chain in the final slot (the ADVICE
    reduceat edge)."""
    rng = np.random.default_rng(11)
    blobs = _mixed_blobs(seed=11, n=140) + [
        kw.wkb_linestring(np.empty((0, 2))), kw.wkb_polygon([])]
    R = kgeom.WGS84_AUTHALIC_R

    def ref_area(b):
        if b is None:
            return 0.0
        t, p = kw.parse_wkb(b)
        if t != kw.POLYGON:
            return 0.0
        a = kgeom.geodesic_ring_area(p[0]) if len(p) else 0.0
        for hole in p[1:]:
            a -= kgeom.geodesic_ring_area(hole)
        return a

    def ref_len(b):
        if b is None:
            return 0.0
        t, p = kw.parse_wkb(b)
        return kgeom.geodesic_length(p) if t == kw.LINESTRING and len(p) > 1 \
            else 0.0

    got_a = bm.batch_area_spheroid(blobs, R)
    got_l = bm.batch_length_spheroid(blobs, R)
    for i, b in enumerate(blobs):
        assert got_a[i] == pytest.approx(ref_area(b), rel=1e-12, abs=1e-6)
        assert got_l[i] == pytest.approx(ref_len(b), rel=1e-12, abs=1e-9)
