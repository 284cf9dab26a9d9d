"""One certified tiled-Delaunay measurement at a given core count.

The distributed-TIN scaling job: N xxhash64-derived points (identical
bits at every parallelism level), triangulated end-to-end by
``operators/delaunay_dist.delaunay_tiled`` WITH the Euler completeness
certificate on — the timed window includes the tile fan-out, the
per-tile local TINs, the driver residue patch, the distributed
empty-circumdisk verification, and the certificate's hull pass,
because that is the operator's contract.  Prints one JSON line:
{"cores": C, "n_points": N, "wall_sec": T, "points_per_sec": R,
 "facets": K}

Run via scripts/tin_scaling.py (which compares two core counts), or
standalone:  python scripts/tin_scaling_job.py --cores 8 --n 100000
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--target", type=int, default=1000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdal_spark.operators.delaunay_dist import delaunay_tiled
    from gdal_spark.session import get_spark

    # fixed 64 shuffle partitions at EVERY core count: the tile stage
    # is compute-dense (one local TIN per tile), so partition count
    # must exceed tile count for balance — and must be identical at
    # both parallelism levels so the comparison isolates cores
    spark = get_spark("tin_scaling", cores=args.cores,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic general-position layout: two independent xxhash64
    # streams folded to 40-bit fractions — identical doubles at every
    # core count, collision probability ~n^2/2^41 (negligible at the
    # point counts this job runs), no lattice structure
    m = (1 << 40) - 1
    frac_x = (F.xxhash64(F.col("id"), F.lit(0)).bitwiseAND(F.lit(m))
              .cast("double") / F.lit(float(1 << 40)))
    frac_y = (F.xxhash64(F.col("id"), F.lit(1)).bitwiseAND(F.lit(m))
              .cast("double") / F.lit(float(1 << 40)))
    pts = (
        spark.range(args.n)
        .select(F.col("id").alias("pid"),
                (frac_x * 1000.0).alias("x"),
                (frac_y * 1000.0).alias("y"))
        # fixed partition count: identical plan + data layout at every
        # parallelism level, so the comparison isolates the core count
        .repartition(64)
        .persist()
    )
    pts.count()  # materialize input outside the timed window

    # warm-up pass: spawn+import the Python workers once
    delaunay_tiled(pts, target_per_tile=args.target, verify=True).count()

    wall, facets, phases = float("inf"), 0, {}
    for _ in range(args.repeats):
        t = {}
        t0 = time.time()
        facets = delaunay_tiled(
            pts, target_per_tile=args.target, verify=True,
            timings=t).count()
        dt = time.time() - t0
        if dt < wall:
            wall, phases = dt, t

    print(json.dumps({
        "cores": args.cores,
        "n_points": args.n,
        "wall_sec": round(wall, 3),
        "points_per_sec": round(args.n / wall, 1),
        "facets": facets,
        "phases": {k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in phases.items()},
    }))


if __name__ == "__main__":
    main()
