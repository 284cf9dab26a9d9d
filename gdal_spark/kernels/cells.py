"""Discrete-global-grid cell math (H3/S2 role) on a TileMatrix.

The reference's discrete grid is gdal::TileMatrixSet / TileMatrix
(/root/reference/gcore/tilematrixset.hpp:29-88): an origin
(top-left), a per-zoom resolution, and fixed tile dims; zoom z has
2^z x 2^z tiles for quadtree schemes like WebMercatorQuad
(/root/reference/apps/gdalalg_raster_tile.cpp:124-146).  Rows use the
XYZ convention (y grows downward from the top-left origin), matching
``fileY = xyz ? y : matrixHeight-1-y``
(/root/reference/apps/gdalalg_raster_tile.cpp:410-414).

A cell id packs (z, x, y) into one int64:

    cell = (z << 58) | (x << 29) | y      (z<=29, x,y < 2^29)

which is stable, orderable, and reproducible in pure Spark Column
arithmetic (see gdal_spark.functions) — cell encoding never leaves
the JVM on the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

Z_SHIFT = 58
X_SHIFT = 29
XY_MASK = (1 << 29) - 1

# WebMercatorQuad constants (tilematrixset.cpp registry; also
# gdalalg_raster_tile.cpp:124-146): origin at (-R*pi, R*pi),
# world span 2*R*pi, 256-px tiles.
WEB_MERCATOR_ORIGIN = 20037508.342789244
WEB_MERCATOR_SPAN = 2 * WEB_MERCATOR_ORIGIN


@dataclass(frozen=True)
class TileGrid:
    """Quadtree tile grid: zoom z splits the extent into 2^z x 2^z tiles.

    top_left_x/y is the grid origin (x grows right, y grows DOWN from
    the origin, XYZ convention); span is the world width == height of
    the zoom-0 tile.
    """

    top_left_x: float
    top_left_y: float
    span: float
    tile_size: int = 256

    @staticmethod
    def web_mercator_quad(tile_size: int = 256) -> "TileGrid":
        return TileGrid(-WEB_MERCATOR_ORIGIN, WEB_MERCATOR_ORIGIN,
                        WEB_MERCATOR_SPAN, tile_size)

    @staticmethod
    def local(minx: float, miny: float, maxx: float, maxy: float,
              tile_size: int = 256) -> "TileGrid":
        """Grid over a local Cartesian extent (square cover of the bbox).

        Used for the poly.shp-style local CRS fixtures (FIXTURES.md);
        plays the role of a custom TileMatrixSet JSON in GDAL.
        """
        span = max(maxx - minx, maxy - miny)
        # pad 1e-9 relative so points exactly on the max edge stay in range
        span *= 1.0 + 1e-9
        return TileGrid(minx, miny + span, span, tile_size)

    # ---- tile addressing -------------------------------------------------
    def tile_span(self, z: int) -> float:
        return self.span / (1 << z)

    def resolution(self, z: int) -> float:
        return self.tile_span(z) / self.tile_size

    def tile_xy(self, z, px, py):
        """Tile indices containing world points (vectorized), clamped
        to the matrix like GetTileIndices does for valid extents."""
        ts = self.tile_span(z)
        n = (1 << z) - 1
        tx = np.floor((np.asarray(px, np.float64) - self.top_left_x) / ts)
        ty = np.floor((self.top_left_y - np.asarray(py, np.float64)) / ts)
        tx = np.clip(tx, 0, n).astype(np.int64)
        ty = np.clip(ty, 0, n).astype(np.int64)
        return tx, ty

    def tile_bounds(self, z, tx, ty):
        """(minx, miny, maxx, maxy) of tile (z, tx, ty)."""
        ts = self.tile_span(z)
        tx = np.asarray(tx, np.float64)
        ty = np.asarray(ty, np.float64)
        minx = self.top_left_x + tx * ts
        maxy = self.top_left_y - ty * ts
        return minx, maxy - ts, minx + ts, maxy

    def geotransform(self, z, tx, ty):
        """GDAL-style geotransform (x0, resx, 0, y0, 0, -resy) of a tile."""
        minx, _, _, maxy = self.tile_bounds(z, int(tx), int(ty))
        res = self.resolution(z)
        return (float(minx), res, 0.0, float(maxy), 0.0, -res)

    def tile_range_for_bbox(self, z, minx, miny, maxx, maxy):
        """Inclusive (tx0, ty0, tx1, ty1) of tiles intersecting a bbox —
        the coarse phase of the two-phase spatial filter
        (ogrlayer.cpp:2253-2325) and GetTileIndices
        (gdalalg_raster_tile.cpp:336)."""
        tx0, ty1 = self.tile_xy(z, minx, miny)
        tx1, ty0 = self.tile_xy(z, maxx, maxy)
        return int(tx0), int(ty0), int(tx1), int(ty1)


# ---- cell id packing ----------------------------------------------------

def pack_cell(z, x, y):
    z = np.asarray(z, np.int64)
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    return (z << Z_SHIFT) | (x << X_SHIFT) | y


def unpack_cell(cell):
    cell = np.asarray(cell, np.int64)
    z = cell >> Z_SHIFT
    x = (cell >> X_SHIFT) & XY_MASK
    y = cell & XY_MASK
    return z, x, y


def cell_of_point(grid: TileGrid, z: int, px, py):
    tx, ty = grid.tile_xy(z, px, py)
    return pack_cell(np.full_like(tx, z), tx, ty)


def parent_cell(cell):
    """Parent at z-1 (quadtree)."""
    z, x, y = unpack_cell(cell)
    return pack_cell(z - 1, x >> 1, y >> 1)


def neighbor_ring(z: int, tx: int, ty: int, k: int):
    """Cells at Chebyshev distance exactly k from (tx, ty), clipped to
    the matrix.  Ring 0 is the cell itself.  This is the discrete
    analogue of the radius-growth loop in GDALGridNearestNeighbor
    (/root/reference/alg/gdalgrid.cpp:909-920): kNN candidates come
    from rings 0..r, expanding r until k neighbors are guaranteed."""
    n = 1 << z
    if k == 0:
        return [(tx, ty)]
    out = []
    for dx in range(-k, k + 1):
        for dy in (-k, k):
            x, y = tx + dx, ty + dy
            if 0 <= x < n and 0 <= y < n:
                out.append((x, y))
    for dy in range(-k + 1, k):
        for dx in (-k, k):
            x, y = tx + dx, ty + dy
            if 0 <= x < n and 0 <= y < n:
                out.append((x, y))
    return out


def disk_cells(z: int, tx: int, ty: int, k: int):
    """All cells with Chebyshev distance <= k (rings 0..k), clipped."""
    n = 1 << z
    return [
        (x, y)
        for x in range(max(0, tx - k), min(n, tx + k + 1))
        for y in range(max(0, ty - k), min(n, ty + k + 1))
    ]
