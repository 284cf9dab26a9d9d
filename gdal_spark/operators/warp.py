"""Warp / reproject: coordinate transforms + raster tile warping.

The reference's warper is a transformer chain + resampling kernel
over memory-bounded chunks (/root/reference/alg/gdaltransformer.cpp:
96-159, /root/reference/alg/gdalwarpkernel.cpp,
/root/reference/alg/gdalwarpoperation.cpp:927-1267).  v1 supports the
EPSG:4326 <-> 3857 pair (SURVEY non-goals bound the SRS catalog):

* point reprojection is PURE Column math — the spherical-mercator
  formulas compile into whole-stage codegen (no UDF at all), exactly
  like OGRCoordinateTransformation's array API vectorizes
  (/root/reference/ogr/ogrct.cpp:2264);
* tile warping inverts the reference's chunk loop: per OUTPUT tile,
  back-project the pixel-center grid into source coordinates, gather
  the source tiles that cover the back-projected bbox (covering-cell
  explode, the same fan-out as rasterize), and sample nearest-
  neighbor inside one applyInPandas group per output tile.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .. import functions as gf
from ..kernels import checksum as kck
from ..kernels import geom as kgeom
from ..kernels.cells import TileGrid

R_MERC = 6378137.0

OUT_SCHEMA = "tx long, ty long, band int, px binary, checksum long"


# ---- Column-level point reprojection ------------------------------------
def lonlat_to_mercator_cols(lon: Column, lat: Column) -> tuple[Column, Column]:
    """Spherical web-mercator forward — Column twin of
    kernels.geom.lonlat_to_mercator (same formula order)."""
    x = F.lit(R_MERC) * F.radians(lon)
    y = F.lit(R_MERC) * F.log(
        F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / F.lit(2.0)))
    return x, y


def mercator_to_lonlat_cols(x: Column, y: Column) -> tuple[Column, Column]:
    lon = F.degrees(x / F.lit(R_MERC))
    lat = F.degrees(
        F.lit(2.0) * F.atan(F.exp(y / F.lit(R_MERC))) - F.lit(math.pi / 2.0))
    return lon, lat


def reproject_points(df: DataFrame, x_col: str, y_col: str,
                     direction: str = "to_mercator") -> DataFrame:
    if direction == "to_mercator":
        x, y = lonlat_to_mercator_cols(F.col(x_col), F.col(y_col))
    else:
        x, y = mercator_to_lonlat_cols(F.col(x_col), F.col(y_col))
    return df.withColumn(f"{x_col}_out", x).withColumn(f"{y_col}_out", y)


# ---- tile warp -----------------------------------------------------------
def cubic_convolution(d1, d2, d3, f0, f1, f2, f3):
    """GDAL's cubic convolution (gdalwarpkernel.cpp:2931-2937,
    A=-0.5 Catmull-Rom family), d1..d3 = fractional offset powers."""
    return f1 + 0.5 * (d1 * (f2 - f0)
                       + d2 * (2 * f0 - 5 * f1 + 4 * f2 - f3)
                       + d3 * (3 * (f1 - f2) + f3 - f0))


def bspline_weight(d):
    """Cubic B-spline via truncated powers (GWKBSpline,
    gdalwarpkernel.cpp:3523-3545) — the reference omits the 1/6
    factor too; it cancels in the weight normalization."""
    return (np.maximum(d + 2.0, 0.0) ** 3
            - 4.0 * np.maximum(d + 1.0, 0.0) ** 3
            + 6.0 * np.maximum(d, 0.0) ** 3
            - 4.0 * np.maximum(d - 1.0, 0.0) ** 3)


def lanczos_weight(d):
    """Lanczos windowed sinc, radius 3 (GWKLanczosSinc,
    gdalwarpkernel.cpp:3383-3398): sinc(x)*sinc(x/3) for |x|<3."""
    d = np.asarray(d, dtype=np.float64)
    out = np.zeros_like(d)
    nz = (d != 0.0) & (np.abs(d) < 3.0)
    pix = np.pi * d[nz]
    out[nz] = 3.0 * np.sin(pix) * np.sin(pix / 3.0) / (pix * pix)
    out[d == 0.0] = 1.0
    return out


def bilinear_weight(d):
    return np.maximum(0.0, 1.0 - np.abs(np.asarray(d, dtype=np.float64)))


def cubic_weight(d):
    """A=-0.5 cubic kernel (GWKCubic filter form): matches
    cubic_convolution at unit scale, usable at scaled arguments."""
    ad = np.abs(np.asarray(d, dtype=np.float64))
    w1 = (1.5 * ad - 2.5) * ad * ad + 1.0
    w2 = -0.5 * (((ad - 5.0) * ad + 8.0) * ad - 4.0)
    return np.where(ad <= 1.0, w1, np.where(ad < 2.0, w2, 0.0))


_KERNEL_W = {"bilinear": bilinear_weight, "cubic": cubic_weight,
             "cubicspline": bspline_weight, "lanczos": lanczos_weight}
_FILTER_RADIUS = {"bilinear": 1, "cubic": 2, "cubicspline": 2, "lanczos": 3}


def _snap_scale(scale: float) -> float:
    """Near-integer reciprocal snapping (gdalwarpkernel.cpp:
    1043-1058): 1/scale within 0.05 of an integer collapses to it."""
    if scale >= 1.0:
        return 1.0
    recip = 1.0 / scale
    n = int(recip + 0.5)
    if n >= 1 and abs(recip - n) < 0.05:
        return 1.0 / n
    return scale


_METHOD_PAD = {"near": 0, "bilinear": 1, "cubic": 2,
               "cubicspline": 2, "lanczos": 3,
               "average": 1, "sum": 1, "min": 1, "max": 1, "rms": 1,
               "mode": 1, "med": 1, "q1": 1, "q3": 1}
_AREA_METHODS = ("average", "sum", "min", "max", "rms",
                 "mode", "med", "q1", "q3")
_QUANT = {"med": 0.5, "q1": 0.25, "q3": 0.75}


def warp_tiles(src_tiles: DataFrame, src_grid: TileGrid, src_zoom: int,
               dst_grid: TileGrid, dst_zoom: int,
               direction: str = "identity", dtype: str = "uint8",
               src_tile_size: int | None = None,
               dst_tile_size: int | None = None,
               nodata: float = 0.0, method: str = "near",
               anti_alias: bool = False,
               cutline: list | None = None) -> DataFrame:
    """Warp a tiled raster from src_grid to dst_grid.

    direction: how dst world coords map to src world coords —
    'identity' (same CRS, regridding/resampling), 'dst_merc_src_ll'
    (dst is EPSG:3857, src EPSG:4326), or 'dst_ll_src_merc'.
    method: 'near' | 'bilinear' | 'cubic' | 'cubicspline' |
    'lanczos' | 'average' | 'sum' | 'min' | 'max' | 'rms' | 'mode' |
    'med' | 'q1' | 'q3' — the full GWKNearest / GWKBilinearResample /
    GWKCubicResample / GWKBSpline / GWKLanczosSinc /
    GWKAverageOrMode kernel family (alg/gdalwarpkernel.cpp:101-180).
    mode follows GDAL's tie strategy GWKTS_First (first value to
    reach the max count in the y-major source scan wins,
    gdalwarpkernel.cpp:7396-7427); med/q1/q3 take the sorted
    footprint value at index ceil(q*n - 1) — no interpolation
    (gdalwarpkernel.cpp:7603-7607).  bilinear/cubic/spline/lanczos
    sample a source
    MOSAIC assembled per destination tile (halo pixels come from the
    padded fan-out), weights renormalized over valid cells at dataset
    edges (the reference falls back near/bilinear there).
    anti_alias=True switches the kernel methods to the reference's
    scaled general resampler when downsampling (radius
    ceil(filter/scale), weights K((i-dx)*scale), reciprocal-snapped
    scale — gdalwarpkernel.cpp:1184-1190, GWKResample :3733-3860);
    at unit scale or for non-kernel methods it is a no-op.
    cutline: optional polygon rings [outer, hole...] in DST world
    coordinates — output pixels whose centers fall outside get
    ``nodata`` (gdalwarp -cutline, gdalwarpoperation.cpp
    ComputeSourceWindow + the cutline mask of gdalwarper.cpp:
    GDALWarpCutlineMasker role, CUTLINE_ALL_TOUCHED off).  The area
    methods reduce every source pixel whose CENTER falls in the
    destination pixel's back-projected footprint (bbox of its 4
    corners), GDAL's average/sum/min/max/rms window semantics.
    """
    np_dtype = np.dtype(dtype)
    is_float = np.issubdtype(np_dtype, np.floating)
    sts = src_tile_size or src_grid.tile_size
    dts = dst_tile_size or dst_grid.tile_size
    pad = _METHOD_PAD[method]

    # anti-aliased downsampling (the general-resampler path,
    # gdalwarpkernel.cpp:1184-1190 + GWKResample :3733-3860): kernel
    # radius widens to ceil(filter/scale), weights evaluate at
    # (i - dx) * scale, normalized over the window.  scale is the
    # dst->src resolution ratio with GDAL's reciprocal snapping.
    aa_scale = 1.0
    aa_radius = aa_init = 0
    if anti_alias and method in _FILTER_RADIUS:
        aa_scale = _snap_scale(
            src_grid.resolution(src_zoom) / dst_grid.resolution(dst_zoom))
        if aa_scale < 1.0:
            filt = _FILTER_RADIUS[method]
            aa_radius = int(math.ceil(filt / aa_scale))
            aa_init = ((filt + 1) % 2) - aa_radius
            pad = aa_radius

    # 'dst_utm{zone}_src_ll': dst is WGS84/UTM zone N (gdalwarp
    # -t_srs EPSG:326NN role), src is lon/lat — back-projection via
    # the Snyder tmerc inverse (kernels/geom.py).
    _m = re.match(r"dst_utm(\d+)_src_ll$", direction)
    is_utm = _m is not None
    utm_lon0 = (-183.0 + 6.0 * int(_m.group(1))) if _m else None
    _m2 = re.match(r"dst_ll_src_utm(\d+)$", direction)
    is_utm_src = _m2 is not None
    if _m2:
        utm_lon0 = -183.0 + 6.0 * int(_m2.group(1))
    del _m, _m2   # re.Match objects cannot pickle into task closures

    def to_src(xs, ys):
        if direction == "identity":
            return xs, ys
        if direction == "dst_merc_src_ll":
            return kgeom.mercator_to_lonlat(xs, ys)
        if direction == "dst_ll_src_merc":
            return kgeom.lonlat_to_mercator(xs, ys)
        if is_utm:
            return kgeom.tmerc_inverse(xs, ys, utm_lon0)
        if is_utm_src:
            # dst lon/lat -> src UTM meters (gdalwarp -s_srs role)
            return kgeom.tmerc_forward(xs, ys, utm_lon0)
        raise ValueError(direction)

    # enumerate destination tiles covering the source extent: project
    # the source tiles' bboxes into dst coords and explode dst cells
    def _dst_of_src(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                band = int(r["band"])
                minx, miny, maxx, maxy = src_grid.tile_bounds(
                    src_zoom, int(r["tx"]), int(r["ty"]))
                if pad:
                    # halo: this tile also serves dst tiles that only
                    # need its border pixels for the kernel window
                    h = pad * src_grid.resolution(src_zoom)
                    minx, miny, maxx, maxy = (minx - h, miny - h,
                                              maxx + h, maxy + h)
                # map src bbox corners to dst world coords
                if direction == "identity":
                    dminx, dminy, dmaxx, dmaxy = minx, miny, maxx, maxy
                elif direction == "dst_merc_src_ll":
                    xs, ys = kgeom.lonlat_to_mercator(
                        np.array([minx, maxx]), np.array([miny, maxy]))
                    dminx, dmaxx = float(xs[0]), float(xs[1])
                    dminy, dmaxy = float(ys[0]), float(ys[1])
                elif direction == "dst_ll_src_merc":
                    lon, lat = kgeom.mercator_to_lonlat(
                        np.array([minx, maxx]), np.array([miny, maxy]))
                    dminx, dmaxx = float(lon[0]), float(lon[1])
                    dminy, dmaxy = float(lat[0]), float(lat[1])
                elif is_utm_src:
                    # UTM src -> lon/lat dst: inverse-project corners
                    # + edge midpoints
                    bx = np.array([minx, maxx, minx, maxx,
                                   (minx + maxx) / 2.0,
                                   (minx + maxx) / 2.0, minx, maxx])
                    by = np.array([miny, miny, maxy, maxy, miny, maxy,
                                   (miny + maxy) / 2.0,
                                   (miny + maxy) / 2.0])
                    lon, lat = kgeom.tmerc_inverse(bx, by, utm_lon0)
                    dminx, dmaxx = float(lon.min()), float(lon.max())
                    dminy, dmaxy = float(lat.min()), float(lat.max())
                else:
                    # UTM dst: forward-project the src bbox corners +
                    # edge midpoints (tmerc bends meridians slightly)
                    bx = np.array([minx, maxx, minx, maxx,
                                   (minx + maxx) / 2.0,
                                   (minx + maxx) / 2.0, minx, maxx])
                    by = np.array([miny, miny, maxy, maxy, miny, maxy,
                                   (miny + maxy) / 2.0,
                                   (miny + maxy) / 2.0])
                    ex, ny_ = kgeom.tmerc_forward(bx, by, utm_lon0)
                    dminx, dmaxx = float(ex.min()), float(ex.max())
                    dminy, dmaxy = float(ny_.min()), float(ny_.max())
                tx0, ty0, tx1, ty1 = dst_grid.tile_range_for_bbox(
                    dst_zoom, dminx, dminy, dmaxx, dmaxy)
                for dty in range(ty0, ty1 + 1):
                    for dtx in range(tx0, tx1 + 1):
                        rows.append((dtx, dty, band, int(r["tx"]),
                                     int(r["ty"]), r["px"]))
            yield pd.DataFrame(
                rows, columns=["dtx", "dty", "band", "stx", "sty", "px"])

    src_in = src_tiles if "band" in src_tiles.columns else         src_tiles.withColumn("band", F.lit(1))
    fanout = src_in.select("tx", "ty", "band", "px").mapInPandas(
        _dst_of_src,
        "dtx long, dty long, band int, stx long, sty long, px binary")

    sres = src_grid.resolution(src_zoom)
    stlx, stly = src_grid.top_left_x, src_grid.top_left_y

    def _warp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        dtx, dty, band = int(key[0]), int(key[1]), int(key[2])
        # back-project the dst tile's pixel centers
        minx, miny, maxx, maxy = dst_grid.tile_bounds(dst_zoom, dtx, dty)
        res = dst_grid.resolution(dst_zoom)
        cx = minx + (np.arange(dts) + 0.5) * res
        cy = maxy - (np.arange(dts) + 0.5) * res
        gx, gy = np.meshgrid(cx, cy)
        sx, sy = to_src(gx.ravel(), gy.ravel())
        # continuous source pixel coords (pixel centers at +0.5)
        sfx = (sx - stlx) / sres
        sfy = (stly - sy) / sres

        if method == "near":
            out = _sample_near(pdf, sfx, sfy)
        elif method in _AREA_METHODS:
            # footprint corners: pixel edges at centers -/+ half a
            # dst pixel, back-projected through the same transform
            hx = res / 2.0
            ax0, ay0 = to_src((gx - hx).ravel(), (gy + hx).ravel())
            ax1, ay1 = to_src((gx + hx).ravel(), (gy - hx).ravel())
            fx0 = (np.minimum(ax0, ax1) - stlx) / sres
            fx1 = (np.maximum(ax0, ax1) - stlx) / sres
            fy0 = (stly - np.maximum(ay0, ay1)) / sres
            fy1 = (stly - np.minimum(ay0, ay1)) / sres
            out = _sample_area(pdf, fx0, fx1, fy0, fy1, method)
        elif aa_radius:
            out = _sample_kernel_scaled(pdf, sfx, sfy, method)
        else:
            out = _sample_kernel(pdf, sfx, sfy, method)
        out = np.where(np.isnan(out), nodata, out)
        if cutline is not None:
            from ..kernels import pip as kpip
            keep = kpip.points_in_polygon(gx.ravel(), gy.ravel(),
                                          [np.asarray(r) for r in cutline])
            out = np.where(keep, out, nodata)
        if not is_float:
            info = np.iinfo(np_dtype)
            out = np.clip(np.floor(out + 0.5), info.min, info.max)
        res_arr = out.astype(np_dtype).reshape(dts, dts)
        return pd.DataFrame({
            "tx": [dtx], "ty": [dty], "band": [band],
            "px": [res_arr.tobytes()],
            "checksum": [kck.checksum(res_arr, is_float=is_float)],
        })

    def _sample_near(pdf, sfx, sfy):
        spx = np.floor(sfx).astype(np.int64)
        spy = np.floor(sfy).astype(np.int64)
        out = np.full(sfx.shape, np.nan)
        for _, r in pdf.iterrows():
            arr = np.frombuffer(r["px"], dtype=np_dtype).reshape(sts, sts)
            x0, y0 = int(r["stx"]) * sts, int(r["sty"]) * sts
            m = ((spx >= x0) & (spx < x0 + sts)
                 & (spy >= y0) & (spy < y0 + sts))
            out[m] = arr[spy[m] - y0, spx[m] - x0]
        return out

    def _mosaic(pdf, gx0, gx1, gy0, gy1):
        canvas = np.full((gy1 - gy0 + 1, gx1 - gx0 + 1), np.nan)
        for _, r in pdf.iterrows():
            arr = np.frombuffer(r["px"], dtype=np_dtype).reshape(sts, sts)
            tx0, ty0 = int(r["stx"]) * sts, int(r["sty"]) * sts
            ax0, ax1 = max(tx0, gx0), min(tx0 + sts - 1, gx1)
            ay0, ay1 = max(ty0, gy0), min(ty0 + sts - 1, gy1)
            if ax0 > ax1 or ay0 > ay1:
                continue
            canvas[ay0 - gy0:ay1 - gy0 + 1, ax0 - gx0:ax1 - gx0 + 1] = \
                arr[ay0 - ty0:ay1 - ty0 + 1, ax0 - tx0:ax1 - tx0 + 1]
        return canvas

    def _sample_area(pdf, fx0, fx1, fy0, fy1, method):
        # source pixel c contributes when its center c+0.5 is in
        # [f0, f1): c >= ceil(f0 - 0.5), c + 0.5 < f1 (strict)
        ix0 = np.ceil(fx0 - 0.5).astype(np.int64)
        iy0 = np.ceil(fy0 - 0.5).astype(np.int64)
        gx0, gx1 = int(ix0.min()), int(np.ceil(fx1.max() - 0.5))
        gy0, gy1 = int(iy0.min()), int(np.ceil(fy1.max() - 0.5))
        canvas = _mosaic(pdf, gx0, gx1, gy0, gy1)
        kx = int(np.max(np.ceil(fx1 - 0.5) - ix0)) + 1
        ky = int(np.max(np.ceil(fy1 - 0.5) - iy0)) + 1
        acc = None
        cnt = np.zeros(fx0.shape)
        taps = []           # (value, ok) per tap, y-major scan order
        for oy in range(ky):
            for ox in range(kx):
                cx = ix0 + ox
                cy = iy0 + oy
                inside = ((cx + 0.5 < fx1) & (cy + 0.5 < fy1)
                          & (cx >= gx0) & (cx <= gx1)
                          & (cy >= gy0) & (cy <= gy1))
                v = canvas[np.clip(cy - gy0, 0, canvas.shape[0] - 1),
                           np.clip(cx - gx0, 0, canvas.shape[1] - 1)]
                ok = inside & ~np.isnan(v)
                vv = np.where(ok, v, 0.0)
                if method in ("mode", "med", "q1", "q3"):
                    taps.append((v, ok))
                    cnt += ok
                    continue
                if method == "min":
                    term = np.where(ok, v, np.inf)
                    acc = term if acc is None else np.minimum(acc, term)
                elif method == "max":
                    term = np.where(ok, v, -np.inf)
                    acc = term if acc is None else np.maximum(acc, term)
                elif method == "rms":
                    acc = vv * vv if acc is None else acc + vv * vv
                else:                      # average / sum
                    acc = vv if acc is None else acc + vv
                cnt += ok
        if method == "mode":
            # faithful transcription of the reference's running-count
            # update with GWKTS_First ties (gdalwarpkernel.cpp:
            # 7396-7427): tap k's count after its own increment must
            # STRICTLY exceed the running max to steal the mode, so a
            # tie goes to the value that reached the max count
            # earliest in the y-major scan.
            mode = np.full(fx0.shape, np.nan)
            max_cnt = np.zeros(fx0.shape)
            npix = int(np.prod(fx0.shape))
            int_ok = (np.issubdtype(np_dtype, np.integer)
                      and npix * (int(np.iinfo(np_dtype).max)
                                  - int(np.iinfo(np_dtype).min) + 1)
                      <= 8_000_000)
            if int_ok:
                # linear path: per-(pixel, bin) running counts, the
                # vector analogue of the reference's pafCounts array
                lo = int(np.iinfo(np_dtype).min)
                nbins = int(np.iinfo(np_dtype).max) - lo + 1
                counts = np.zeros((npix, nbins))
                rows = np.arange(npix)
                for vk, okk in taps:
                    vi = np.where(okk, vk, lo).astype(np.int64) - lo
                    counts[rows, vi] += okk
                    ck = counts[rows, vi]
                    upd = okk & (ck > max_cnt)
                    mode = np.where(upd, vk, mode)
                    max_cnt = np.where(upd, ck, max_cnt)
                return mode
            for k, (vk, okk) in enumerate(taps):
                ck = np.zeros(fx0.shape)
                for vj, okj in taps[:k + 1]:
                    ck += okj & okk & (vj == vk)
                upd = okk & (ck > max_cnt)
                mode = np.where(upd, vk, mode)
                max_cnt = np.where(upd, ck, max_cnt)
            return mode
        if method in _QUANT:
            stack = np.stack([np.where(ok, v, np.nan) for v, ok in taps])
            stack = np.sort(stack, axis=0)      # NaN sorts last
            idx = np.ceil(_QUANT[method] * cnt - 1).astype(np.int64)
            idx = np.clip(idx, 0, len(taps) - 1)
            out = np.take_along_axis(stack, idx[None, :], axis=0)[0]
            return np.where(cnt > 0, out, np.nan)
        if method == "average":
            with np.errstate(invalid="ignore", divide="ignore"):
                return np.where(cnt > 0, acc / cnt, np.nan)
        if method == "rms":
            with np.errstate(invalid="ignore", divide="ignore"):
                return np.where(cnt > 0, np.sqrt(acc / cnt), np.nan)
        if method in ("min", "max"):
            return np.where(cnt > 0, acc, np.nan)
        return np.where(cnt > 0, acc, np.nan)   # sum

    def _sample_kernel_scaled(pdf, sfx, sfy, method):
        """Scaled general resampler: taps i in [aa_init, aa_radius],
        weight K((i - dx) * aa_scale) per axis, normalized over the
        valid window (GWKResample :3813-3860)."""
        wfun = _KERNEL_W[method]
        fx = sfx - 0.5
        fy = sfy - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        gx0, gx1 = int(x0.min()) + aa_init, int(x0.max()) + aa_radius
        gy0, gy1 = int(y0.min()) + aa_init, int(y0.max()) + aa_radius
        canvas = _mosaic(pdf, gx0, gx1, gy0, gy1)
        dx = fx - x0
        dy = fy - y0
        wx = {i: wfun((i - dx) * aa_scale)
              for i in range(aa_init, aa_radius + 1)}
        wy = {j: wfun((j - dy) * aa_scale)
              for j in range(aa_init, aa_radius + 1)}
        num = np.zeros(fx.shape)
        den = np.zeros(fx.shape)
        for oy in range(aa_init, aa_radius + 1):
            for ox in range(aa_init, aa_radius + 1):
                px = np.clip(x0 + ox - gx0, 0, canvas.shape[1] - 1)
                py = np.clip(y0 + oy - gy0, 0, canvas.shape[0] - 1)
                inb = ((x0 + ox >= gx0) & (x0 + ox <= gx1)
                       & (y0 + oy >= gy0) & (y0 + oy <= gy1))
                v = canvas[py, px]
                ok = inb & ~np.isnan(v)
                w = wx[ox] * wy[oy]
                num += np.where(ok, w * np.where(ok, v, 0.0), 0.0)
                den += np.where(ok, w, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(den != 0.0, num / den, np.nan)

    def _sample_kernel(pdf, sfx, sfy, method):
        # assemble the source mosaic needed by this dst tile
        fx = sfx - 0.5
        fy = sfy - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        _TAPS = {"bilinear": (0, 2), "cubic": (-1, 3),
                 "cubicspline": (-1, 3), "lanczos": (-2, 4)}
        k0, k1 = _TAPS[method]
        gx0, gx1 = int(x0.min()) + k0, int(x0.max()) + k1
        gy0, gy1 = int(y0.min()) + k0, int(y0.max()) + k1
        canvas = _mosaic(pdf, gx0, gx1, gy0, gy1)
        dx = fx - x0
        dy = fy - y0
        if method == "bilinear":
            offs = [(0, 0), (1, 0), (0, 1), (1, 1)]
            wts = [(1 - dx) * (1 - dy), dx * (1 - dy),
                   (1 - dx) * dy, dx * dy]
        else:
            nk = k1 - k0
            if method == "cubic":
                wx = [cubic_convolution(dx, dx * dx, dx ** 3,
                                        *(1.0 * (np.arange(4) == k))
                                        ) for k in range(4)]
                wy = [cubic_convolution(dy, dy * dy, dy ** 3,
                                        *(1.0 * (np.arange(4) == k))
                                        ) for k in range(4)]
            else:
                wfun = (bspline_weight if method == "cubicspline"
                        else lanczos_weight)
                wx = [wfun((k + k0) - dx) for k in range(nk)]
                wy = [wfun((k + k0) - dy) for k in range(nk)]
            offs = [(ix + k0, iy + k0) for iy in range(nk)
                    for ix in range(nk)]
            wts = [wx[ix] * wy[iy] for iy in range(nk) for ix in range(nk)]
        num = np.zeros(fx.shape)
        den = np.zeros(fx.shape)
        for (ox, oy), w in zip(offs, wts):
            px = np.clip(x0 + ox - gx0, 0, canvas.shape[1] - 1)
            py = np.clip(y0 + oy - gy0, 0, canvas.shape[0] - 1)
            inb = ((x0 + ox >= gx0) & (x0 + ox <= gx1)
                   & (y0 + oy >= gy0) & (y0 + oy <= gy1))
            v = canvas[py, px]
            ok = inb & ~np.isnan(v)
            num += np.where(ok, w * np.where(ok, v, 0.0), 0.0)
            den += np.where(ok, w, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(den != 0.0, num / den, np.nan)

    # band in the key: a multi-band source warps each band alone
    return fanout.groupBy("dtx", "dty", "band").applyInPandas(
        _warp, OUT_SCHEMA)
