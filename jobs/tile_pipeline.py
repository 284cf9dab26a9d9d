"""End-to-end tile pipeline job — the north rule's launch shape.

    spark-submit --py-files gdal_spark.zip jobs/tile_pipeline.py \
        --out /tmp/tiles_out --n-docs 200000 --zoom 5 [--cores 8]

Stages (each a resumable lineage unit, so re-running after a crash
skips completed work exactly — ``gdal raster tile --resume``
semantics):

  docs      synthesize the interleaved text+media docs table
            (fixtures seed=42), extract geo spans -> points;
  join      two-phase cell spatial join against the polygon layer
            (broadcast + JVM exact ray cast), first-match;
  tiles:z   rasterize doc points into zoom-z tiles (burn count,
            MERGE ADD) with golden checksums;
  tiles:z-1..0   pyramid levels, each reading the previous level
            back from the committed output.

The job asserts the span-sequence invariant (input_hint): every doc
that flows through the join keeps its spans array byte-identical,
checked via xxhash64 comparison of spans before/after.
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
    ap.add_argument("--n-docs", type=int, default=200_000)
    ap.add_argument("--zoom", type=int, default=5)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--run-id", default="run1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdal_spark.kernels.cells import TileGrid
    from gdal_spark.operators import lineage as ln
    from gdal_spark.operators.raster_tile import pyramid_reduce, rasterize_tiles
    from gdal_spark.operators.spatial_join import extract_geo_points, spatial_join
    from gdal_spark.session import get_spark
    from gdal_spark.sources import fixtures as fx

    spark = get_spark("tile_pipeline", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    grid = TileGrid.local(*fx.POLY_BBOX)
    docs_dir = os.path.join(args.out, "docs")
    join_dir = os.path.join(args.out, "joined")

    # ---- stage: docs (unit 0) -------------------------------------
    def _docs(_unit):
        return spark.createDataFrame(fx.docs_pandas(args.n_docs))

    ln.run_stage(spark, docs_dir, args.run_id, "docs", [0], _docs)
    docs = ln.read_stage(spark, docs_dir)
    spans_in = docs.select(
        "doc_id", F.xxhash64(F.to_json("spans")).alias("h_in"))

    # ---- stage: join (unit 0) -------------------------------------
    polys = spark.createDataFrame(fx.polygons_pandas())

    def _join(_unit):
        pts = extract_geo_points(docs)
        return spatial_join(pts, polys, grid, zoom=6, first_match=True)

    ln.run_stage(spark, join_dir, args.run_id, "join", [0], _join)
    joined = ln.read_stage(spark, join_dir)

    # span-sequence invariant (input_hint): spans survive byte-equal
    spans_out = joined.select(
        "doc_id", F.xxhash64(F.to_json("spans")).alias("h_out"))
    bad = (
        spans_out.join(spans_in, "doc_id")
        .filter(F.col("h_in") != F.col("h_out")).count()
    )
    assert bad == 0, f"span-sequence invariant violated for {bad} docs"

    # ---- stages: tiles per zoom (resumable per level) -------------
    from gdal_spark.kernels import wkb as kwkb

    @F.pandas_udf("binary")
    def _pt_wkb(xs, ys):
        import pandas as pd
        return pd.Series([kwkb.wkb_point(x, y) for x, y in zip(xs, ys)])

    pts_xy = joined.select(
        F.col("doc_id").alias("fid"), "x", "y",
        F.col("x").alias("xmin"), F.col("y").alias("ymin"),
        F.col("x").alias("xmax"), F.col("y").alias("ymax"),
    ).withColumn("wkb", _pt_wkb("x", "y"))

    tiles_dir = os.path.join(args.out, "tiles")
    n_tiles = {}

    def _level_df(z):
        if z == args.zoom:
            t = rasterize_tiles(
                pts_xy, grid, z, burn=1.0, merge="ADD", dtype="uint16")
        else:
            prev = ln.read_stage(spark, tiles_dir).filter(F.col("z") == z + 1)
            t = pyramid_reduce(prev, z + 1, method="average", dtype="uint16")
        # lineage unit = 4x4 tile block within the level (level in the
        # high bits so units never collide across stages)
        return t.withColumn(
            "unit",
            F.shiftleft(F.lit(z).cast("long"), 40)
            .bitwiseOR(F.shiftleft(F.shiftrightunsigned("tx", 2), 20))
            .bitwiseOR(F.shiftrightunsigned("ty", 2)))

    # each level is ONE distributed job committing all its pending
    # units (per-task data+lineage writes) — no per-unit job loop
    for z in range(args.zoom, -1, -1):
        ln.commit_partitioned(spark, tiles_dir, args.run_id, f"tiles:{z}",
                              _level_df(z))
        n_tiles[z] = (
            ln.read_stage(spark, tiles_dir).filter(F.col("z") == z).count())

    wall = time.time() - t0
    n_docs = docs.count()
    print(json.dumps({
        "n_docs": n_docs,
        "n_joined": joined.count(),
        "tiles_per_zoom": n_tiles,
        "span_invariant_violations": bad,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
    }))


if __name__ == "__main__":
    main()
