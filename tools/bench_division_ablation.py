#!/usr/bin/env python3
"""Isolate the cost of the reference-exact coordinate divisions in the

pixel-chunk correlation scan (ops/corr.py) vs reciprocal-multiply.

Round-2 context: BENCH_r01 (reciprocal) 134.7 fps -> BENCH_r02 (true
division) 131.3 fps on the headline forward, with the division change the
only hot-path edit — this tool measures whether the division actually
costs that, by running the identical bench workload in two subprocesses
toggled via RMVD_TPU_CORR_RECIP (read at trace time in ops/corr.py).

Usage: python tools/bench_division_ablation.py [--repeats 3]
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def run_bench(recip: bool):
    env = dict(os.environ)
    env["RMVD_TPU_CORR_RECIP"] = "1" if recip else "0"
    env["BENCH_ONLY"] = "robust_mvd_bf16"
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["value"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    div, recip = [], []
    for i in range(args.repeats):
        div.append(run_bench(recip=False))
        recip.append(run_bench(recip=True))
        print(f"round {i}: division {div[-1]} fps | reciprocal {recip[-1]} fps")

    best_div, best_recip = max(div), max(recip)
    delta = (best_recip - best_div) / best_div * 100
    print(
        json.dumps(
            {
                "division_fps": div,
                "reciprocal_fps": recip,
                "best_division_fps": best_div,
                "best_reciprocal_fps": best_recip,
                "reciprocal_speedup_pct": round(delta, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
