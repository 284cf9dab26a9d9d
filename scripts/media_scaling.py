"""Two-cluster-size scaling evidence for the media decode surface.

Runs the AVI decode + frame-sampling pipeline (synth N deterministic
videos -> decode container bytes -> per-frame features, the
media_decode_avi shape) at local[lo] and local[hi] in separate JVMs
on the SAME input and reports throughput at both plus scaling
efficiency — the same methodology as scripts/scaling.py (spatial
join) and scripts/tin_scaling.py (certified TIN).

    python scripts/media_scaling.py [--n 200000] [--lo 2] [--hi 8]
           [--no-append]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gdal_spark.session import get_spark
from gdal_spark.operators import multimodal as mm

cores, n = {cores}, {n}
spark = get_spark("media-scaling", cores=cores,
                  shuffle_partitions=max(cores, 8))
spark.sparkContext.setLogLevel("ERROR")
docs = (spark.range(n).select(F.col("id").alias("doc_id"))
        # fixed partition count: identical plan + data layout at every
        # parallelism level, so the comparison isolates the core count
        .repartition(64))
t0 = time.time()
out = mm.frame_sample_real(mm.synth_avi_col_rows(docs), stride=2)
out.write.mode("overwrite").format("noop").save()
wall = time.time() - t0
print(json.dumps({{"cores": cores, "n_docs": n,
                   "wall_sec": round(wall, 2),
                   "docs_per_sec": int(n / wall)}}))
spark.stop()
"""


def run_once(cores: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _JOB.format(repo=REPO, cores=cores, n=n)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"scaling job at {cores} cores printed no JSON line; "
            f"stderr tail: {out.stderr[-500:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--no-append", action="store_true")
    args = ap.parse_args()

    lo = run_once(args.lo, args.n)
    hi = run_once(args.hi, args.n)
    speedup = lo["wall_sec"] / hi["wall_sec"]
    ratio = args.hi / args.lo
    eff = speedup / ratio
    result = {
        "job": "media_decode_avi_frame_sample",
        "n_docs": args.n,
        "lo": lo, "hi": hi,
        "speedup": round(speedup, 3),
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    if not args.no_append:
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(
                f"\n## Scaling run (media decode: AVI frame sampling, "
                f"{args.n:,} videos)\n\n"
                f"| cores | wall (s) | videos/sec |\n|---|---|---|\n"
                f"| {lo['cores']} | {lo['wall_sec']} | "
                f"{lo['docs_per_sec']:,} |\n"
                f"| {hi['cores']} | {hi['wall_sec']} | "
                f"{hi['docs_per_sec']:,} |\n\n"
                f"speedup {result['speedup']}x over {ratio:.0f}x cores -> "
                f"**scaling efficiency {result['scaling_efficiency']}** "
                f"(north-rule target >= 0.8, measured N->{ratio:.0f}N).  "
                f"Decode happens where "
                f"the container bytes land (mapInPandas, no shuffle after "
                f"synthesis), so the job is embarrassingly parallel — "
                f"reproduce: `python scripts/media_scaling.py --n "
                f"{args.n} --lo {args.lo} --hi {args.hi}`.\n"
            )


if __name__ == "__main__":
    main()
