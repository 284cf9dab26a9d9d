"""Polygon x polygon layer algebra vs the reference's goldens.

Fixtures + expected cardinalities/geometry ported from
/root/reference/autotest/ogr/ogr_layer_algebra.py (A = two unit-height
squares, B = one enclosing-ish rectangle; D = two adjacent squares
sharing an edge — the degenerate case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels import clip as kclip
from gdal_spark.kernels import wkb as kwkb
from gdal_spark.kernels.cells import TileGrid
from gdal_spark.operators import layer_algebra as la

GRID = TileGrid.local(0.0, 0.0, 8.0, 8.0)
Z = 3


def _sq(x0, y0, x1, y1):
    return np.array(
        [(x0, y0), (x0, y1), (x1, y1), (x1, y0), (x0, y0)], float)


def _layer(spark, rects):
    rows = []
    for fid, (x0, y0, x1, y1) in rects.items():
        w = kwkb.wkb_polygon([_sq(x0, y0, x1, y1)])
        rows.append({"fid": fid, "wkb": w, "xmin": float(x0),
                     "ymin": float(y0), "xmax": float(x1),
                     "ymax": float(y1)})
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.fixture(scope="module")
def AB(spark):
    A = _layer(spark, {1: (1, 2, 3, 3), 2: (5, 2, 7, 3)})
    B = _layer(spark, {1: (2, 1, 6, 4)})
    return A, B


@pytest.fixture(scope="module")
def D(spark):
    return _layer(spark, {1: (1, 2, 3, 3), 2: (3, 2, 4, 3)})


def _rows(df):
    return [r.asDict() for r in df.collect()]


def _total_area(rows):
    return sum(r["area"] for r in rows if r["area"] is not None)


def test_poly_intersection_golden(AB):
    """ogr_layer_algebra.py test_algebra_intersection_1: 2 pieces."""
    rows = _rows(la.poly_intersection(*AB, GRID, Z))
    assert len(rows) == 2
    got = {(r["afid"], r["bfid"]): r for r in rows}
    assert set(got) == {(1, 1), (2, 1)}
    assert got[(1, 1)]["area"] == pytest.approx(1.0)
    assert kwkb.wkb_bbox(bytes(got[(1, 1)]["wkb"])) == (2.0, 2.0, 3.0, 3.0)
    assert kwkb.wkb_bbox(bytes(got[(2, 1)]["wkb"])) == (5.0, 2.0, 6.0, 3.0)


def test_poly_union_golden(AB):
    """test_algebra_union_1: 5 features, total area |A|+|B|-|A∩B|."""
    rows = _rows(la.poly_union(*AB, GRID, Z))
    assert len(rows) == 5
    assert _total_area(rows) == pytest.approx(4 + 12 - 2)


def test_poly_symdifference_golden(AB):
    """test_algebra_symdifference_1: 3 features."""
    rows = _rows(la.poly_sym_difference(*AB, GRID, Z))
    assert len(rows) == 3
    assert _total_area(rows) == pytest.approx(4 + 12 - 2 * 2)


def test_poly_identity_golden(AB):
    """test_algebra_identity_1: 4 features, total |A|."""
    rows = _rows(la.poly_identity(*AB, GRID, Z))
    assert len(rows) == 4
    assert _total_area(rows) == pytest.approx(4.0)


def test_poly_update_golden(AB):
    """test_algebra_update_1: 3 features (A-B pieces + B as-is)."""
    rows = _rows(la.poly_update(*AB, GRID, Z))
    assert len(rows) == 3
    assert sum(1 for r in rows if r["bfid"] is not None) == 1


def test_poly_clip_golden(AB):
    """test_algebra_clip_1: 2 features, total |A∩B|."""
    rows = _rows(la.poly_clip(*AB, GRID, Z))
    assert len(rows) == 2
    assert _total_area(rows) == pytest.approx(2.0)


def test_poly_erase_golden(AB):
    """test_algebra_erase_1: 2 features, total |A|-|A∩B|."""
    rows = _rows(la.poly_erase(*AB, GRID, Z))
    assert len(rows) == 2
    assert _total_area(rows) == pytest.approx(2.0)


def test_self_ops_degenerate_shared_edge(D):
    """D x D (adjacent squares sharing the x=3 edge):
    intersection == D, symdifference/erase empty, union == D —
    test_algebra_*_3 series with KEEP_LOWER_DIMENSION=NO."""
    inter = _rows(la.poly_intersection(D, D, GRID, Z))
    assert len(inter) == 2 and _total_area(inter) == pytest.approx(3.0)
    assert la.poly_sym_difference(D, D, GRID, Z).count() == 0
    assert la.poly_erase(D, D, GRID, Z).count() == 0
    un = _rows(la.poly_union(D, D, GRID, Z))
    assert len(un) == 2 and _total_area(un) == pytest.approx(3.0)
    upd = _rows(la.poly_update(D, D, GRID, Z))
    assert len(upd) == 2 and all(r["bfid"] is not None for r in upd)


def test_cascaded_union(spark):
    """Overlapping + disjoint squares merge to 2 polygons, area 7."""
    df = _layer(spark, {1: (0, 0, 2, 2), 2: (1, 0, 3, 2), 3: (5, 5, 6, 6)})
    rows = _rows(la.cascaded_union(df))
    assert len(rows) == 2
    assert _total_area(rows) == pytest.approx(4 + 4 - 2 + 1)


def test_kernel_hole_punch():
    """Difference that punches a hole: ring nesting + area."""
    outer = [_sq(0, 0, 10, 10)]
    inner = [_sq(4, 4, 6, 6)]
    got = kclip.boolean_op(outer, inner, "difference")
    assert len(got) == 1 and len(got[0]) == 2  # one outer + one hole
    assert kclip.polygons_area(got) == pytest.approx(96.0)
    # intersection with something crossing the hole
    clip_sq = [_sq(3, 3, 7, 7)]
    region = kclip.flatten(got)
    part = kclip.boolean_op(region, clip_sq, "intersection")
    assert kclip.polygons_area(part) == pytest.approx(16.0 - 4.0)


def test_clip_lines_and_erase_partition_length(spark):
    """Clip + erase of a line layer partition every line's length."""
    import numpy as np
    import pandas as pd

    from gdal_spark.kernels import wkb as kwkb
    from gdal_spark.kernels.cells import TileGrid
    from gdal_spark.operators.layer_algebra import clip_lines

    rows = []
    rng = np.random.RandomState(4)
    for k in range(30):
        p = rng.rand(2, 2) * 40
        rows.append({"fid": k, "wkb": kwkb.wkb_linestring(p),
                     "xmin": p[:, 0].min(), "ymin": p[:, 1].min(),
                     "xmax": p[:, 0].max(), "ymax": p[:, 1].max()})
    lines = spark.createDataFrame(pd.DataFrame(rows))
    rect = np.array([[10.0, 8.0], [30.0, 8.0], [30.0, 28.0],
                     [10.0, 28.0], [10.0, 8.0]])
    polys = spark.createDataFrame(pd.DataFrame([{
        "fid": 0, "wkb": kwkb.wkb_polygon([rect]),
        "xmin": 10.0, "ymin": 8.0, "xmax": 30.0, "ymax": 28.0}]))
    grid = TileGrid.local(0.0, 0.0, 40.0, 40.0, tile_size=64)
    inside = {r["afid"]: r["tot"] for r in clip_lines(
        lines, polys, grid, zoom=3).groupBy("afid").agg(
        F.sum("length").alias("tot")).collect()}
    outside = {r["afid"]: r["tot"] for r in clip_lines(
        lines, polys, grid, zoom=3, keep_inside=False).groupBy("afid").agg(
        F.sum("length").alias("tot")).collect()}
    for row in rows:
        g = kwkb.parse_wkb(row["wkb"])[1]
        seg = np.diff(np.asarray(g), axis=0)
        total = float(np.sqrt((seg ** 2).sum(axis=1)).sum())
        got = inside.get(row["fid"], 0.0) + outside.get(row["fid"], 0.0)
        # candidate_pairs only yields bbox-overlapping pairs; lines
        # fully outside never reach the kernel -> no inside OR
        # outside rows; only check lines that produced SOMETHING
        if row["fid"] in inside or row["fid"] in outside:
            assert abs(got - total) < 1e-6, row["fid"]
