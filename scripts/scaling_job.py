"""One spatial-join throughput measurement at a given core count.

The north-rule metric job: N derived doc points x the 10-polygon
fixture layer, two-phase cell join + exact ray-cast PIP, executed
end-to-end (noop sink).  Prints one JSON line:
{"cores": C, "n_docs": N, "wall_sec": T, "docs_per_sec": R}

Run via scripts/scaling.py (which compares two core counts), or
standalone:  python scripts/scaling_job.py --cores 8 --n 4000000
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
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--n", type=int, default=4_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdal_spark.operators.spatial_join import spatial_join
    from gdal_spark.queries import _derive as dv
    from gdal_spark.session import get_spark
    from gdal_spark.sources import fixtures as fx

    spark = get_spark("scaling", cores=args.cores,
                      shuffle_partitions=max(args.cores, 8))
    spark.sparkContext.setLogLevel("ERROR")

    x, y = dv.point_cols(F.col("doc_id"))
    pts = (
        spark.range(args.n)
        .select(F.col("id").alias("doc_id"))
        .withColumn("x", x).withColumn("y", y)
        # fixed partition count: identical plan + data layout at every
        # parallelism level, so the comparison isolates the core count
        .repartition(64)
        .persist()
    )
    pts.count()  # materialize input outside the timed window

    polys = spark.createDataFrame(fx.polygons_pandas())

    # warm-up pass: spawn+import the Python workers once (cold-start
    # is per-executor setup cost, amortized to zero in a long job)
    spatial_join(pts, polys, dv.GRID, zoom=6, how="inner").write.mode(
        "overwrite").format("noop").save()

    # min of 3 repeats: steady-state throughput, robust to the
    # sandbox VM's bursty scheduling
    wall = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = spatial_join(pts, polys, dv.GRID, zoom=6, how="inner")
        out.write.mode("overwrite").format("noop").save()
        wall = min(wall, time.time() - t0)

    print(json.dumps({
        "cores": args.cores,
        "n_docs": args.n,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(args.n / wall, 1),
    }))


if __name__ == "__main__":
    main()
