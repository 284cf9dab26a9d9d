"""`gdal raster pipeline` role: declarative read -> steps -> write
runner over tile tables (spark-submit --py-files job + importable
library), the raster twin of jobs/vector_pipeline.py.

Reference: /root/reference/apps/gdalalg_raster_pipeline.cpp (step
registry mirrors the standalone algorithms; gdalalg_abstract_
pipeline.h chains them).  Steps implemented where this engine has the
operator — all over the engine's tile table convention
(tx long, ty long, px binary, tile_size x tile_size, row-major):

  read           parquet tile table
  calc           VRT pixel-function expression over named bands
                 (gdalalg_raster_calc)
  reclassify     range table -> value     (gdalalg_raster_reclassify)
  scale          gdal_translate -scale    (gdalalg_raster_scale)
  hillshade / slope / aspect / tpi / tri / roughness
                 focal DEM derivatives    (gdalalg_raster_hillshade...)
  clip           srcwin pixel-window crop (gdalalg_raster_clip)
  sieve          small-blob removal       (gdalalg_raster_sieve)
  fill-nodata    IDW ring fill            (gdalalg_raster_fill_nodata)
  proximity      distance transform       (gdalalg_raster_proximity)
  overview       one pyramid reduce level (gdalalg_raster_overview)
  index          gdaltindex manifest      (gdalalg_raster_index)
  write          parquet, plain or lineage-committed units

Each step is a DataFrame transform; the pipeline is one lazy plan
until the write.  Unknown step names fail fast with the supported
list, like the reference CLI.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402


def _read(spark, df, spec):
    return spark.read.parquet(spec["path"])


def _calc(spark, df, spec):
    from gdal_spark.operators.raster_calc import calc_tiles
    return calc_tiles({spec.get("band", "A"): df}, spec["expr"],
                      dtype=spec.get("dtype", "uint8"),
                      out_dtype=spec.get("out_dtype", "float64"),
                      tile_size=spec.get("tile_size", 256))


def _reclassify(spark, df, spec):
    from gdal_spark.operators.raster_calc import reclassify_tiles
    return reclassify_tiles(df, [tuple(r) for r in spec["ranges"]],
                            default=spec.get("default", 0),
                            dtype=spec.get("dtype", "uint8"),
                            tile_size=spec.get("tile_size", 256))


def _scale(spark, df, spec):
    from gdal_spark.operators.raster_calc import translate_scale_tiles
    return translate_scale_tiles(
        df, src_min=spec.get("src_min"), src_max=spec.get("src_max"),
        dst_min=spec.get("dst_min", 0.0), dst_max=spec.get("dst_max", 255.0),
        exponent=spec.get("exponent"), dtype=spec.get("dtype", "uint8"),
        tile_size=spec.get("tile_size", 256))


def _focal(kernel):
    def step(spark, df, spec):
        from gdal_spark.operators.focal import focal_tiles
        return focal_tiles(df, kernel, spec.get("zoom", 0),
                           ewres=spec.get("ewres", 1.0),
                           nsres=spec.get("nsres", 1.0),
                           dtype=spec.get("dtype", "uint8"),
                           tile_size=spec.get("tile_size", 256))
    return step


def _sieve(spark, df, spec):
    from gdal_spark.operators.sieve import sieve_tiles
    return sieve_tiles(df, int(spec["threshold"]),
                       dtype=spec.get("dtype", "uint8"),
                       tile_size=spec.get("tile_size", 256))


def _fill_nodata(spark, df, spec):
    from gdal_spark.operators.fill import fill_nodata_tiles
    return fill_nodata_tiles(df, spec["nodata"],
                             radius=spec.get("radius", 3),
                             dtype=spec.get("dtype", "uint8"),
                             tile_size=spec.get("tile_size", 256))


def _proximity(spark, df, spec):
    from gdal_spark.operators.proximity import proximity_tiles
    return proximity_tiles(df, spec["target_values"],
                           maxdist=spec.get("maxdist", 64.0),
                           dtype=spec.get("dtype", "uint8"),
                           tile_size=spec.get("tile_size", 256))


def _clip(spark, df, spec):
    from gdal_spark.operators.raster_tile import translate_window
    return translate_window(df, int(spec["x0"]), int(spec["y0"]),
                            int(spec["w"]), int(spec["h"]),
                            dtype=spec.get("dtype", "uint8"),
                            tile_size=spec.get("tile_size", 256))


def _overview(spark, df, spec):
    from gdal_spark.operators.raster_tile import pyramid_reduce
    return pyramid_reduce(df, int(spec["zoom"]),
                          method=spec.get("method", "average"),
                          dtype=spec.get("dtype", "uint8"),
                          tile_size=spec.get("tile_size", 256))


def _index(spark, df, spec):
    from gdal_spark.kernels.cells import TileGrid
    from gdal_spark.operators.raster_tile import tile_index
    g = spec.get("grid", {})
    grid = TileGrid(g.get("top_left_x", 0.0), g.get("top_left_y", 256.0),
                    g.get("span", 256.0))
    return tile_index(df, grid, int(spec.get("zoom", 0)))


def _write(spark, df, spec):
    path = spec["path"]
    units = spec.get("units")
    if not units:
        df.write.mode("overwrite").parquet(path)
        return df
    from gdal_spark.operators import lineage as ln
    key = spec.get("unit_key", df.columns[0])
    unit = (F.crc32(F.col(key).cast("string")) % int(units)).cast("long")
    run_id = spec.get("run_id", f"rp-{int(time.time())}")
    ln.commit_partitioned(spark, path, run_id, spec.get("stage", "write"),
                          df.withColumn("unit", unit))
    return df


STEPS = {
    "read": _read,
    "calc": _calc,
    "reclassify": _reclassify,
    "scale": _scale,
    "hillshade": _focal("hillshade"),
    "slope": _focal("slope"),
    "aspect": _focal("aspect"),
    "tpi": _focal("tpi"),
    "tri": _focal("tri"),
    "roughness": _focal("roughness"),
    "clip": _clip,
    "sieve": _sieve,
    "fill-nodata": _fill_nodata,
    "proximity": _proximity,
    "overview": _overview,
    "index": _index,
    "write": _write,
}


def run_raster_pipeline(spark: SparkSession,
                        steps: list[dict]) -> DataFrame:
    if not steps or steps[0].get("step") != "read":
        raise ValueError("pipeline must start with a 'read' step")
    df: DataFrame | None = None
    for spec in steps:
        name = spec.get("step")
        fn = STEPS.get(name)
        if fn is None:
            raise ValueError(
                f"unknown step {name!r}; supported: {sorted(STEPS)}")
        df = fn(spark, df, spec)
    return df


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from gdal_spark.session import get_spark
    spark = get_spark("raster-pipeline", cores=args.cpus,
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    with open(args.pipeline) as f:
        steps = json.load(f)
    out = run_raster_pipeline(spark, steps)
    n = out.count() if out is not None else 0
    print(json.dumps({"rows": n, "steps": len(steps)}))


if __name__ == "__main__":
    main()
