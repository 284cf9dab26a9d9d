"""Layer algebra: Intersection / Union / Clip / Erase / Identity /
Update / SymDifference over a point layer and a polygon layer.

Semantics follow OGRLayer's layer-algebra methods
(/root/reference/ogr/ogrsf_frmts/generic/ogrlayer.cpp — Intersection
:3345, Union :3763, SymDifference :4300, Identity :4730, Update
:5148, Clip :5497, Erase :5806).  For a POINT method layer the
geometric kernel degenerates to containment, so every operation is a
composition of the engine's two-phase spatial join — the coarse cell
equi-join + exact JVM ray cast — plus semi/anti joins:

  Intersection(P, Q) = points in >=1 polygon, attrs combined
  Clip(P, Q)         = points in >=1 polygon, P attrs only (dedup)
  Erase(P, Q)        = points in no polygon
  Identity(P, Q)     = Intersection + Erase remainder (P split by Q)
  Union(P, Q)        = Identity + polygons with no point (Q-only)
  Update(P, Q)       = Erase + method features passed through
  SymDifference      = Erase + Q-only remainders

Polygon x polygon boolean geometry (true piece construction) needs a
clipping kernel the engine doesn't ship yet — documented as future
work in SURVEY §7; the reference's own tests exercise the attribute/
cardinality semantics these compositions reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernels.cells import TileGrid
from .spatial_join import spatial_join


def _matches(points: DataFrame, polys: DataFrame, grid: TileGrid,
             zoom: int) -> DataFrame:
    return spatial_join(points, polys, grid, zoom=zoom, how="inner")


def intersection(points: DataFrame, polys: DataFrame, grid: TileGrid,
                 zoom: int = 6) -> DataFrame:
    """Points falling in polygons, with combined attributes —
    one output row per (point, containing polygon) pair, matching the
    pairwise-intersection cardinality of ogrlayer.cpp:3345."""
    return _matches(points, polys, grid, zoom)


def clip(points: DataFrame, polys: DataFrame, grid: TileGrid,
         zoom: int = 6) -> DataFrame:
    """Input features cut to the method layer's area: point subset,
    input attributes only (ogrlayer.cpp:5497)."""
    key = points.columns[0]
    hit = _matches(points, polys, grid, zoom).select(key).distinct()
    return points.join(hit, key, "left_semi")


def erase(points: DataFrame, polys: DataFrame, grid: TileGrid,
          zoom: int = 6) -> DataFrame:
    """Input minus the method layer's area (ogrlayer.cpp:5806)."""
    key = points.columns[0]
    hit = _matches(points, polys, grid, zoom).select(key).distinct()
    return points.join(hit, key, "left_anti")


def identity(points: DataFrame, polys: DataFrame, grid: TileGrid,
             zoom: int = 6) -> DataFrame:
    """Input split by the method layer: matched rows carry polygon
    attrs, unmatched rows carry NULLs (ogrlayer.cpp:4730) — i.e. the
    'left' mode of the spatial join."""
    return spatial_join(points, polys, grid, zoom=zoom, how="left")


def union(points: DataFrame, polys: DataFrame, grid: TileGrid,
          zoom: int = 6) -> DataFrame:
    """Identity + method-only remainders: polygons containing no
    point appear once with NULL point attrs (ogrlayer.cpp:3763)."""
    ident = identity(points, polys, grid, zoom)
    hit_fids = _matches(points, polys, grid, zoom).select("fid").distinct()
    q_only = polys.drop("wkb").join(hit_fids, "fid", "left_anti")
    return ident.unionByName(q_only, allowMissingColumns=True)


def update(points: DataFrame, polys: DataFrame, grid: TileGrid,
           zoom: int = 6) -> DataFrame:
    """Method layer patches over the input: input features outside Q
    + all Q features (ogrlayer.cpp:5148)."""
    outside = erase(points, polys, grid, zoom)
    return outside.unionByName(polys.drop("wkb"), allowMissingColumns=True)


def sym_difference(points: DataFrame, polys: DataFrame, grid: TileGrid,
                   zoom: int = 6) -> DataFrame:
    """A-only + B-only remainders (ogrlayer.cpp:4300)."""
    a_only = erase(points, polys, grid, zoom)
    hit_fids = _matches(points, polys, grid, zoom).select("fid").distinct()
    b_only = polys.drop("wkb").join(hit_fids, "fid", "left_anti")
    return a_only.unionByName(b_only, allowMissingColumns=True)
