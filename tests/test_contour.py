"""Contour: marching-squares kernel goldens + distributed tile-split
invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gdal_spark.kernels import contour as kc
from gdal_spark.kernels import wkb as kwkb
from gdal_spark.operators.contour import contour_tiles

TS, N = 16, 2


def _norm_line(pts):
    pts = [tuple(p) for p in pts]
    if pts[0] == pts[-1] and len(pts) > 1:      # closed: rotate to min
        body = pts[:-1]
        k = body.index(min(body))
        body = body[k:] + body[:k]
        return ("closed", tuple(body))
    return ("open", tuple(pts))


def test_kernel_simple_hill():
    a = np.zeros((8, 8))
    a[3:5, 3:5] = 10.0
    lines = kc.contour_array(a, 5.0)
    assert len(lines) == 1
    kind, pts = _norm_line(lines[0])
    assert kind == "closed"
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    assert 2.0 <= min(xs) and max(xs) <= 5.0
    assert 2.0 <= min(ys) and max(ys) <= 5.0


def test_kernel_open_line():
    yy = np.arange(6)[:, None] * np.ones((1, 6))
    lines = kc.contour_array(yy, 2.5)   # horizontal gradient -> one open line
    assert len(lines) == 1
    kind, pts = _norm_line(lines[0])
    assert kind == "open"
    assert all(p[1] == 2.5 for p in pts)


def _dem():
    rng = np.random.RandomState(3)
    a = rng.uniform(0, 10, size=(N * TS, N * TS))
    # smooth so contours are sane
    for _ in range(3):
        a = 0.25 * (np.roll(a, 1, 0) + np.roll(a, -1, 0)
                    + np.roll(a, 1, 1) + np.roll(a, -1, 1))
    return np.round(a * 10).astype(np.uint8)


def _tiles_df(spark, arr):
    rows = [
        {"tx": tx, "ty": ty,
         "px": bytearray(arr[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS]
                         .tobytes())}
        for ty in range(N) for tx in range(N)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_contour_tile_split_invariance(spark):
    arr = _dem()
    levels = [45.5, 52.5]
    rows = contour_tiles(_tiles_df(spark, arr), levels,
                         tile_size=TS).collect()
    got = set()
    for r in rows:
        pts = kwkb.parse_wkb(bytes(r["wkb"]))[1]
        got.add((r["level"],) + _norm_line([tuple(p) for p in pts]))
    want = set()
    for level in levels:
        for line in kc.contour_array(arr.astype(np.float64), level):
            want.add((level,) + _norm_line(line))
    assert got == want
    assert len(got) > 2


def test_kernel_saddle_disambiguates_on_corner_average():
    """FORMULA-DIFF pin (queries/_goldens.py): the two ambiguous
    marching-squares cases (diagonal corners above) split on the
    corner AVERAGE — above-average centers connect the high corners,
    below-average centers separate them."""
    from gdal_spark.kernels.contour import cell_segments

    level = 5.0
    # tl, br high; average (8+8+0+0)/4 = 4 < level -> separated: the
    # two segments must NOT share the same edge pairing as the
    # connected case below
    segs_lo = cell_segments(level, 0, 0, 8.0, 0.0, 0.0, 8.0)
    assert len(segs_lo) == 2
    # raise the low corners so the average crosses the level
    segs_hi = cell_segments(level, 0, 0, 8.0, 4.0, 4.0, 8.0)
    assert len(segs_hi) == 2
    assert {tuple(map(tuple, s)) for s in segs_lo} != \
        {tuple(map(tuple, s)) for s in segs_hi}
    # every endpoint sits on a cell edge with coords in [0, 1]
    for segs in (segs_lo, segs_hi):
        for (x1, y1), (x2, y2) in segs:
            for v in (x1, y1, x2, y2):
                assert 0.0 <= v <= 1.0
