"""Band algebra: expression evaluation + reclassification over tiles.

The reference's per-pixel expression machinery — VRT pixel functions
(/root/reference/frmts/vrt/pixelfunctions.cpp:3940-4030), free-form
muparser bands (/root/reference/frmts/vrt/vrtexpression_muparser.cpp),
``gdal raster calc`` (/root/reference/apps/gdalalg_raster_calc.cpp)
and the reclassifier (/root/reference/frmts/vrt/vrtreclassifier.cpp)
— maps to numpy expressions over co-grouped band tiles: the bands
join on (tx, ty) (one shuffle keyed by tile), and the expression runs
vectorized per tile.  The expression namespace is a whitelist of
numpy ufuncs — no arbitrary eval surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels import checksum as kck

OUT_SCHEMA = "tx long, ty long, px binary, checksum long"

_SAFE_FUNCS = {
    "sqrt": np.sqrt, "log": np.log, "log10": np.log10, "exp": np.exp,
    "abs": np.abs, "minimum": np.minimum, "maximum": np.maximum,
    "where": np.where, "sin": np.sin, "cos": np.cos, "floor": np.floor,
    "clip": np.clip, "power": np.power,
}


def calc_tiles(bands: dict[str, DataFrame], expr: str,
               dtype: str = "uint8", out_dtype: str = "float64",
               tile_size: int = 256) -> DataFrame:
    """Evaluate ``expr`` over named band-tile DataFrames.

    bands: {"A": tilesA, "B": tilesB, ...} each (tx, ty, px).
    Missing tiles in a band read as 0 (VRT's default fill).
    """
    np_dtype = np.dtype(dtype)
    np_out = np.dtype(out_dtype)
    ts = tile_size
    code = compile(expr, "<raster_calc>", "eval")
    for name in code.co_names:
        if name not in _SAFE_FUNCS and name not in bands:
            raise ValueError(f"unknown symbol in expression: {name}")

    names = sorted(bands)
    joined = None
    for name in names:
        b = bands[name].select(
            "tx", "ty", F.col("px").alias(f"px_{name}"))
        joined = b if joined is None else joined.join(b, ["tx", "ty"], "outer")

    def _calc(key, pdf: pd.DataFrame) -> pd.DataFrame:
        env = dict(_SAFE_FUNCS)
        for name in names:
            raw = pdf.iloc[0][f"px_{name}"]
            env[name] = (
                np.frombuffer(raw, dtype=np_dtype).reshape(ts, ts)
                .astype(np.float64)
                if raw is not None else np.zeros((ts, ts)))
        out = np.asarray(eval(code, {"__builtins__": {}}, env),
                         dtype=np_out)
        return pd.DataFrame({
            "tx": [int(key[0])], "ty": [int(key[1])],
            "px": [out.tobytes()],
            "checksum": [kck.checksum(
                out.astype(np.float64), is_float=True)],
        })

    return joined.groupBy("tx", "ty").applyInPandas(_calc, OUT_SCHEMA)


def reclassify_tiles(tiles: DataFrame, ranges, default=0,
                     dtype: str = "uint8", tile_size: int = 256) -> DataFrame:
    """Reclassify pixel values by half-open ranges
    [(lo, hi, new_value), ...] (first match wins, the reference's
    mapping-table order; vrtreclassifier.cpp semantics)."""
    np_dtype = np.dtype(dtype)
    ts = tile_size
    rng = [(float(lo), float(hi), int(v)) for lo, hi, v in ranges]

    def _re(key, pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.frombuffer(pdf.iloc[0]["px"], dtype=np_dtype).reshape(ts, ts)
        a = arr.astype(np.float64)
        out = np.full((ts, ts), default, dtype=np.int64)
        assigned = np.zeros((ts, ts), dtype=bool)
        for lo, hi, v in rng:
            m = (a >= lo) & (a < hi) & ~assigned
            out[m] = v
            assigned |= m
        out8 = out.astype(np_dtype)
        return pd.DataFrame({
            "tx": [int(key[0])], "ty": [int(key[1])],
            "px": [out8.tobytes()],
            "checksum": [kck.checksum(out8.astype(np.int64))],
        })

    return tiles.groupBy("tx", "ty").applyInPandas(_re, OUT_SCHEMA)


def color_relief_tiles(tiles, ramp, dtype: str = "uint8",
                       tile_size: int = 256):
    """gdaldem color-relief (apps/gdaldem_lib.cpp
    GDALColorReliefGetRGBA, COLOR_SELECTION_INTERPOLATE): per pixel,
    find the first ramp entry whose value is not smaller, clamp below
    the first / above the last entry, otherwise linearly interpolate
    each channel as clamp(int(0.5 + c0 + ratio*(c1-c0)), 0, 255).

    ramp: sorted [(value, r, g, b), ...].  Emits one row per (tile,
    band 1..3) in TILE_SCHEMA — tile-local, no shuffle.
    """
    import pandas as pd

    from ..kernels import checksum as kck

    np_dtype = np.dtype(dtype)
    ts = tile_size
    vals = np.array([e[0] for e in ramp], dtype=np.float64)
    chans = np.array([[e[1], e[2], e[3]] for e in ramp], dtype=np.float64)

    def _map(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                v = np.frombuffer(row["px"], dtype=np_dtype).astype(
                    np.float64)
                i = np.searchsorted(vals, v, side="left")
                lo = np.clip(i - 1, 0, len(vals) - 1)
                hi = np.clip(i, 0, len(vals) - 1)
                with np.errstate(invalid="ignore", divide="ignore"):
                    ratio = np.where(
                        hi == lo, 0.0,
                        (v - vals[lo]) / (vals[hi] - vals[lo]))
                for b in range(3):
                    c = chans[lo, b] + ratio * (chans[hi, b] - chans[lo, b])
                    c = np.clip(np.floor(0.5 + c), 0, 255).astype(np.uint8)
                    arr = c.reshape(ts, ts)
                    out.append({
                        "z": 0, "tx": int(row["tx"]), "ty": int(row["ty"]),
                        "band": b + 1, "px": arr.tobytes(),
                        "checksum": kck.checksum(arr),
                    })
            yield pd.DataFrame(out)

    return tiles.select("tx", "ty", "px").mapInPandas(
        _map, "z int, tx bigint, ty bigint, band int, px binary, "
              "checksum long")


def equalize_tiles(tiles: DataFrame, tile_size: int = 256,
                   dtype: str = "uint8") -> DataFrame:
    """Histogram equalization (gdalenhance -equalize,
    apps/gdalenhance.cpp:364-460 ComputeEqualizationLUTs +
    EnhancerCallback).

    Reference rule, Byte path: 256-bin default histogram over
    [-0.5, 255.5]; extremes zeroed (panHistogram[0] =
    panHistogram[255] = 0); cumulative with the half-bin offset
    (cum[i] = total_before + hist[i]/2, integer); LUT[i] =
    clamp((cum[i] * 256) / total, 0..255) — all integer divisions.
    With nLUTBins == nHistSize the per-pixel bin is the byte value
    itself, so applying is one LUT gather per tile.

    Distribution: the histogram is the existing distributed
    GetHistogram twin (per-tile bincount partials, one (band, bucket)
    agg); the 256-int LUT folds on the driver (bounded step) and
    broadcasts into a tile-local map — no pixel shuffle anywhere.
    """
    from .raster_tile import raster_histogram

    np_dtype = np.dtype(dtype)
    nb = 256
    hist = raster_histogram(tiles, -0.5, 255.5, nb,
                            include_out_of_range=True, dtype=dtype)
    rows = hist.orderBy("band", "bucket").collect()
    by_band: dict[int, list[int]] = {}
    for r in rows:
        by_band.setdefault(r["band"], [0] * nb)[r["bucket"]] = int(r["cnt"])
    luts = {}
    for band, h in by_band.items():
        h = list(h)
        h[0] = 0
        h[nb - 1] = 0
        total = 0
        cum = [0] * nb
        for i in range(nb):
            cum[i] = total + h[i] // 2
            total += h[i]
        if total == 0:
            total = 1
        luts[band] = np.array(
            [max(0, min(nb - 1, (cum[i] * nb) // total)) for i in range(nb)],
            dtype=np_dtype)
    bc = tiles.sparkSession.sparkContext.broadcast(
        {b: lut.tobytes() for b, lut in luts.items()})

    has_band = "band" in tiles.columns
    src = tiles if has_band else tiles.withColumn("band", F.lit(0))

    def _apply(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            lut = np.frombuffer(bc.value[int(r["band"])], dtype=np_dtype)
            a = np.frombuffer(r["px"], dtype=np_dtype)
            out.append({"tx": int(r["tx"]), "ty": int(r["ty"]),
                        "band": int(r["band"]),
                        "px": lut[a.astype(np.int64)].tobytes()})
        return pd.DataFrame(out)

    return src.groupBy("tx", "ty").applyInPandas(
        _apply, "tx long, ty long, band int, px binary")


def translate_scale_tiles(tiles: DataFrame, src_min: float | None = None,
                          src_max: float | None = None,
                          dst_min: float = 0.0, dst_max: float = 255.0,
                          exponent: float | None = None, clip: bool = True,
                          dtype: str = "uint8",
                          tile_size: int = 256) -> DataFrame:
    """gdal_translate -scale [-exponent] (gdal_translate_lib.cpp:
    2163-2284 scale/offset setup + VRTComplexSource application,
    frmts/vrt/vrtsources.cpp:3591-3637).

    Reference rules, exactly:
      * src range defaults to the raster min/max (ComputeRasterMinMax
        role) — here a distributed per-tile min/max partial + one
        scalar agg;
      * srcMax == srcMin -> srcMax += 0.1 (:2173);
      * linear: out = v * scale + offset with
        scale = (dstMax - dstMin)/(srcMax - srcMin),
        offset = -srcMin * scale + dstMin (:2245-2247);
      * exponential: p = (v - srcMin)/(srcMax - srcMin) (0 when
        equal), clipped to [0, 1] unless -noclip, then
        out = (dstMax - dstMin) * p^exponent + dstMin (:3621-3637).
    Emits float64 tiles (the VRT working type before any output-type
    conversion); the map is tile-local, no pixel shuffle.
    """
    np_dtype = np.dtype(dtype)

    if src_min is None or src_max is None:
        def _mm(batches):
            for pdf in batches:
                rows = []
                for _, r in pdf.iterrows():
                    a = np.frombuffer(r["px"], dtype=np_dtype)
                    rows.append({"mn": float(a.min()),
                                 "mx": float(a.max())})
                yield pd.DataFrame(rows, columns=["mn", "mx"])
        mm = (tiles.select("px").mapInPandas(_mm, "mn double, mx double")
              .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
              .collect()[0])
        src_min = float(mm["mn"]) if src_min is None else src_min
        src_max = float(mm["mx"]) if src_max is None else src_max
    if src_max == src_min:
        src_max += 0.1

    if exponent is None:
        scale = (dst_max - dst_min) / (src_max - src_min)
        offset = -1 * src_min * scale + dst_min

        def _apply(batches):
            for pdf in batches:
                out = []
                for _, r in pdf.iterrows():
                    a = np.frombuffer(r["px"], dtype=np_dtype) \
                        .astype(np.float64)
                    out.append({"tx": int(r["tx"]), "ty": int(r["ty"]),
                                "px": (a * scale + offset).tobytes()})
                yield pd.DataFrame(out, columns=["tx", "ty", "px"])
    else:
        rng = src_max - src_min
        span = dst_max - dst_min

        def _apply(batches):
            for pdf in batches:
                out = []
                for _, r in pdf.iterrows():
                    a = np.frombuffer(r["px"], dtype=np_dtype) \
                        .astype(np.float64)
                    p = (a - src_min) / rng
                    if clip:
                        p = np.clip(p, 0.0, 1.0)
                    v = span * np.power(p, exponent) + dst_min
                    out.append({"tx": int(r["tx"]), "ty": int(r["ty"]),
                                "px": v.tobytes()})
                yield pd.DataFrame(out, columns=["tx", "ty", "px"])

    return tiles.select("tx", "ty", "px").mapInPandas(
        _apply, "tx long, ty long, px binary")
