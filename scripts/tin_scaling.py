"""Two-cluster-size scaling evidence for the distributed TIN.

Runs the certified tiled-Delaunay job (scripts/tin_scaling_job.py) at
local[N] and local[4N] in separate JVMs on the SAME xxhash64-derived
point set and reports throughput at both plus scaling efficiency
(= speedup / core-ratio), appending the table to BENCH.md.

    python scripts/tin_scaling.py [--n 100000] [--lo 2] [--hi 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, n: int, target: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tin_scaling_job.py"),
         "--cores", str(cores), "--n", str(n), "--target", str(target)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--target", type=int, default=1000)
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--no-append", action="store_true")
    args = ap.parse_args()

    lo = run_once(args.lo, args.n, args.target)
    hi = run_once(args.hi, args.n, args.target)
    speedup = lo["wall_sec"] / hi["wall_sec"]
    ratio = args.hi / args.lo
    eff = speedup / ratio
    result = {
        "n_points": args.n,
        "lo": lo, "hi": hi,
        "speedup": round(speedup, 3),
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    if args.no_append:
        return
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run (certified tiled Delaunay, "
            f"{args.n:,} points)\n\n"
            f"| cores | wall (s) | points/sec |\n|---|---|---|\n"
            f"| {lo['cores']} | {lo['wall_sec']} | "
            f"{lo['points_per_sec']:,} |\n"
            f"| {hi['cores']} | {hi['wall_sec']} | "
            f"{hi['points_per_sec']:,} |\n\n"
            f"speedup {result['speedup']}x over {ratio:.0f}x cores -> "
            f"**scaling efficiency {result['scaling_efficiency']}** "
            f"(north-rule target >= 0.8 N->4N); facets Euler-certified "
            f"exact at both core counts ({lo['facets']:,}).\n"
            f"Reproduce: `python scripts/tin_scaling.py --n {args.n} "
            f"--lo {args.lo} --hi {args.hi}`.\n"
        )


if __name__ == "__main__":
    main()
