"""Median-cut + dither catalog query.

The box-split recursion and the serial error-diffusion scan are not
SQL-expressible, so the oracle is the serial-golden VALUES pattern:
the pytest-covered kernels run serially over the full derived RGB
grid; the catalog query runs the DISTRIBUTED path (per-tile histogram
partials -> groupBy-sum -> driver cut -> broadcast palette -> per-tile
dither) over the same grid split into tiles, checking the
histogram/shuffle/assembly plumbing end-to-end.  Single-tile fixture
=> the per-tile dither deviation is not in play and the comparison is
bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from . import register
from .raster import GW

_N_COLORS = 16


def _rgb_grid():
    idx = np.arange(GW * GW).reshape(GW, GW)
    return np.stack([((idx * 7) % 256).astype(np.uint8),
                     ((idx * 11) % 256).astype(np.uint8),
                     ((idx * 13) % 256).astype(np.uint8)], axis=-1)


def _golden_sql() -> str:
    from ..kernels import quantize as kq

    rgb = _rgb_grid()
    levels, shift = 32, 3
    h = np.zeros((levels, levels, levels), dtype=np.int64)
    np.add.at(h, (rgb[..., 0].ravel() >> shift,
                  rgb[..., 1].ravel() >> shift,
                  rgb[..., 2].ravel() >> shift), 1)
    pal = kq.median_cut(h, n_colors=_N_COLORS)
    out = kq.dither(rgb, pal)
    rows = []
    for r in range(GW):
        mask_row = out[r].astype(np.int64)
        rows.append((r, int(mask_row.sum()),
                     int((mask_row * np.arange(GW)).sum())))
    vals = ", ".join(f"({r}, {s}, {w})" for r, s, w in rows)
    pvals = ", ".join(f"({i}, {p[0]}, {p[1]}, {p[2]})"
                      for i, p in enumerate(pal.tolist()))
    return (
        f"SELECT CAST(kind AS BIGINT) AS kind, CAST(k AS BIGINT) AS k, "
        f"CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b FROM ("
        f"SELECT 0 AS kind, i AS k, r AS a, g * 1000 + bl AS b "
        f"FROM (VALUES {pvals}) AS p(i, r, g, bl) "
        f"UNION ALL "
        f"SELECT 1 AS kind, r AS k, s AS a, w AS b "
        f"FROM (VALUES {vals}) AS t(r, s, w)) "
        f"ORDER BY kind, k")


@register(
    "mediancut_dither",
    sql=_golden_sql,
    desc="median-cut palette + dither (GDALComputeMedianCutPCT, "
         "gdalmediancut.cpp:266-570; GDALDitherRGB2PCT, gdaldither.cpp:"
         "395-560): distributed 5-bit histogram partials + driver-side "
         "box cuts + broadcast-palette error-diffusion mapping; "
         "serial-golden oracle over palette rows + per-row index sums",
)
def mediancut_dither_q(spark, sf_dir):
    from ..operators.quantize import median_cut_palette, rgb_to_pct

    rgb = _rgb_grid()

    def _mk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{
            "tx": 0, "ty": 0,
            "px_r": rgb[..., 0].tobytes(),
            "px_g": rgb[..., 1].tobytes(),
            "px_b": rgb[..., 2].tobytes(),
        }])

    tiles = spark.range(1).withColumn("_g", F.lit(1)).groupBy(
        "_g").applyInPandas(
        _mk, "tx long, ty long, px_r binary, px_g binary, px_b binary")
    pal = median_cut_palette(tiles, n_colors=_N_COLORS, tile_size=GW)
    out = rgb_to_pct(tiles, pal, tile_size=GW, dither=True)

    pal_rows = [(0, i, int(p[0]), int(p[1]) * 1000 + int(p[2]))
                for i, p in enumerate(pal.tolist())]
    pal_df = spark.createDataFrame(
        pd.DataFrame(pal_rows, columns=["kind", "k", "a", "b"]))

    def _rows(batches):
        for pdf in batches:
            for _, rr in pdf.iterrows():
                m = np.frombuffer(rr["px"], dtype=np.uint8).reshape(
                    GW, GW).astype(np.int64)
                yield pd.DataFrame({
                    "kind": np.ones(GW, dtype=np.int64),
                    "k": np.arange(GW, dtype=np.int64),
                    "a": m.sum(axis=1),
                    "b": (m * np.arange(GW)).sum(axis=1),
                })

    idx_df = out.mapInPandas(_rows, "kind long, k long, a long, b long")
    return pal_df.unionByName(idx_df).orderBy("kind", "k")
