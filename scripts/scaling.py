"""Two-cluster-size scaling evidence (north rule).

Runs the spatial-join throughput job at local[N] and local[4N] in
separate JVMs (subprocesses) on the SAME input size and reports
throughput at both plus scaling efficiency
(= speedup / core-ratio).  Appends the result table to BENCH.md.

    python scripts/scaling.py [--n 4000000] [--lo 8] [--hi 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_job.py"),
         "--cores", str(cores), "--n", str(n)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    args = ap.parse_args()

    lo = run_once(args.lo, args.n)
    hi = run_once(args.hi, args.n)
    speedup = lo["wall_sec"] / hi["wall_sec"]
    ratio = args.hi / args.lo
    eff = speedup / ratio
    result = {
        "n_docs": args.n,
        "lo": lo, "hi": hi,
        "speedup": round(speedup, 3),
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run (spatial join, {args.n:,} docs)\n\n"
            f"| cores | wall (s) | docs/sec |\n|---|---|---|\n"
            f"| {lo['cores']} | {lo['wall_sec']} | {lo['docs_per_sec']:,} |\n"
            f"| {hi['cores']} | {hi['wall_sec']} | {hi['docs_per_sec']:,} |\n\n"
            f"speedup {result['speedup']}x over {ratio:.0f}x cores -> "
            f"**scaling efficiency {result['scaling_efficiency']}** "
            f"(north-rule target >= 0.8 N->4N)\n"
        )


if __name__ == "__main__":
    main()
