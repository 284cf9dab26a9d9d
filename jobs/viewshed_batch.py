"""Batch viewshed job — gdal_viewshed over an observer FLEET, the
cluster-scale shape of alg/viewshed (one reference invocation = one
observer; here 10^k observers fan out as independent tasks).

    spark-submit --py-files gdal_spark.zip jobs/viewshed_batch.py \
        --out /tmp/vs_out --n-docs 100000 --n-obs 64 [--cores 8]

Stages (resumable lineage units — rerunning after a crash recomputes
only uncommitted work, ``--resume`` semantics):

  dem       rasterize the synthetic doc points into uint16 density
            tiles (the DEM stand-in, deterministic from seed=42);
  viewshed  per-observer covering-tile gather + the serial
            reference-plane kernel, committed in observer blocks
            (lineage unit = oid >> 3, one task per block).

Prints per-run JSON with observer visibility stats; a second
invocation with the same --out and --run-id is a no-op resume.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--n-obs", type=int, default=64)
    ap.add_argument("--zoom", type=int, default=3)
    ap.add_argument("--radius", type=int, default=96)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--run-id", default="run1")
    args = ap.parse_args()

    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark.kernels import wkb as kwkb
    from gdal_spark.kernels.cells import TileGrid
    from gdal_spark.operators import lineage as ln
    from gdal_spark.operators.raster_tile import rasterize_tiles
    from gdal_spark.operators.spatial_join import extract_geo_points
    from gdal_spark.operators.viewshed import viewshed_points
    from gdal_spark.session import get_spark
    from gdal_spark.sources import fixtures as fx

    spark = get_spark("viewshed_batch", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    grid = TileGrid.local(*fx.POLY_BBOX)
    ts = grid.tile_size
    side_px = (1 << args.zoom) * ts
    dem_dir = os.path.join(args.out, "dem")
    vs_dir = os.path.join(args.out, "viewshed")

    # ---- stage: dem (single job, tile-block units) ----------------
    docs = spark.createDataFrame(fx.docs_pandas(args.n_docs))
    pts = extract_geo_points(docs)

    @F.pandas_udf("binary")
    def _pt_wkb(xs, ys):
        return pd.Series([kwkb.wkb_point(x, y) for x, y in zip(xs, ys)])

    pts_xy = pts.select(
        F.col("doc_id").alias("fid"), "x", "y",
        F.col("x").alias("xmin"), F.col("y").alias("ymin"),
        F.col("x").alias("xmax"), F.col("y").alias("ymax"),
    ).withColumn("wkb", _pt_wkb("x", "y"))

    dem = rasterize_tiles(pts_xy, grid, args.zoom, burn=1.0, merge="ADD",
                          dtype="uint16").withColumn(
        "unit",
        F.shiftleft(F.shiftrightunsigned("tx", 2), 20)
        .bitwiseOR(F.shiftrightunsigned("ty", 2)))
    ln.commit_partitioned(spark, dem_dir, args.run_id, "dem", dem)
    dem_tiles = ln.read_stage(spark, dem_dir).select("tx", "ty", "px")

    # ---- stage: viewshed (observer-block units) -------------------
    obs = spark.createDataFrame(pd.DataFrame([
        {"oid": k,
         "px": int(args.radius + (k * 37 + 13)
                   % max(1, side_px - 2 * args.radius)),
         "py": int(args.radius + (k * 53 + 29)
                   % max(1, side_px - 2 * args.radius))}
        for k in range(args.n_obs)]))
    vs = viewshed_points(dem_tiles, obs, tile_size=ts,
                         radius_px=args.radius, dtype="uint16",
                         observer_z=3.0, raster_w=side_px,
                         raster_h=side_px)
    vs = vs.select("oid", "x0", "y0", "w", "h", "visible_count",
                   "checksum").withColumn(
        "unit", F.shiftrightunsigned("oid", 3))
    ln.commit_partitioned(spark, vs_dir, args.run_id, "viewshed", vs)
    result = ln.read_stage(spark, vs_dir)

    stats = result.agg(
        F.count("*").alias("n_obs"),
        F.sum("visible_count").alias("visible_px"),
        F.min("visible_count").alias("min_vis"),
        F.max("visible_count").alias("max_vis"),
    ).collect()[0]
    wall = time.time() - t0
    print(json.dumps({
        "n_obs": stats["n_obs"],
        "visible_px": int(stats["visible_px"]),
        "min_vis": int(stats["min_vis"]),
        "max_vis": int(stats["max_vis"]),
        "wall_sec": round(wall, 2),
        "obs_per_sec": round(stats["n_obs"] / wall, 2),
    }))


if __name__ == "__main__":
    main()
