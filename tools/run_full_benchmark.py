"""The COMPLETE robustmvd benchmark protocol at full sample counts.

Runs the RobustMultiViewDepthBenchmark loop over all five datasets at
the published input sizes with the REAL per-dataset sample counts
(93/104/110/200/69 = 576 samples, reference:
rmvd/data/sample_lists/*.robustmvd.mvd.pickle + eval_all.sh:53) on
synthetic stand-in data (the real frames need downloads this
environment cannot make; the protocol's shapes, view sweeps, resume and
pandas plumbing are what this exercises end-to-end).

Captures per dataset: mean/std runtime_model_in_msec over >= 10
non-burn-in samples, peak device memory, wall clock, XLA compile count;
writes docs/artifacts/full_benchmark_r05.json.

Run: python tools/run_full_benchmark.py [--samples-cap N] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

# (name, (H, W), num_views, keyview_idx, num_samples) — sizes from
# eval_all.sh:53, counts + view structure from the bundled manifests
PROTOCOL = [
    ("kitti", (384, 1280), 21, 10, 93),
    ("dtu", (896, 1216), 11, 0, 110),
    ("scannet", (448, 640), 8, 3, 104),
    ("tanks_and_temples", (704, 1280), 11, 0, 69),
    ("eth3d", (768, 1152), 11, 0, 200),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples-cap", type=int, default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--burn-in", type=int, default=3)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "artifacts", "full_benchmark_r05.json",
        ),
    )
    args = ap.parse_args()

    import numpy as np
    import jax

    from robustmvd_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from robustmvd_tpu.data.synthetic import SyntheticMVD
    from robustmvd_tpu.eval.multi_view_depth_evaluation import (
        MultiViewDepthEvaluation,
    )
    from robustmvd_tpu.models import create_model

    compile_count = [0]

    def _on_event(event, duration, **kwargs):
        if "backend_compile" in event:
            compile_count[0] += 1

    try:
        jax.monitoring.register_event_duration_secs_listener(_on_event)
    except Exception:
        pass

    model = create_model(
        "robust_mvd", pretrained=False, weights=None, dtype=args.dtype
    )

    t_suite = time.time()
    per_dataset = []
    for name, (H, W), V, key_idx, n_samples in PROTOCOL:
        if args.samples_cap:
            n_samples = min(n_samples, args.samples_cap)
        dataset = SyntheticMVD(
            num_samples=n_samples,
            num_views=V,
            height=H,
            width=W,
            keyview_idx=key_idx,
            input_size=(H, W),
        )
        evaluation = MultiViewDepthEvaluation(
            out_dir=None,
            inputs=["poses", "intrinsics"],
            view_ordering="quasi-optimal",
            min_source_views=1,
            max_source_views=None,
            eval_uncertainty=True,
            clip_pred_depth=True,
            verbose=False,
        )
        compiles_before = compile_count[0]
        t0 = time.time()
        result = evaluation(
            dataset=dataset, model=model, burn_in_samples=args.burn_in
        )
        wall = time.time() - t0

        rt = result.loc[:, (slice(None), "runtime_model_in_msec")]
        rt_vals = rt.to_numpy().astype(float)
        rt_vals = rt_vals[np.isfinite(rt_vals)]
        mem = result.loc[:, (slice(None), "device_mem_peak_in_mib")]
        mem_vals = mem.to_numpy().astype(float)
        mem_vals = mem_vals[np.isfinite(mem_vals)]
        absrel = result.loc[:, (slice(None), "absrel")].to_numpy().astype(float)

        row = {
            "dataset": name,
            "size": [H, W],
            "views": V,
            "samples": n_samples,
            "runs_timed": int(rt_vals.size),
            "runtime_model_in_msec_mean": round(float(rt_vals.mean()), 3),
            "runtime_model_in_msec_std": round(float(rt_vals.std()), 3),
            "peak_mem_mib": round(float(mem_vals.max()), 1) if mem_vals.size else None,
            "absrel_mean": round(float(np.nanmean(absrel)), 4),
            "wall_sec": round(wall, 1),
            "xla_compiles": compile_count[0] - compiles_before,
        }
        per_dataset.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "protocol": "robustmvd (5 datasets, full sample counts, 1..V-1 source-view sweep, quasi-optimal ordering, AUSE)",
        "total_samples": sum(r["samples"] for r in per_dataset),
        "total_wall_sec": round(time.time() - t_suite, 1),
        "dtype": args.dtype,
        "burn_in": args.burn_in,
        "device": jax.devices()[0].device_kind,
        "datasets": per_dataset,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"total_wall_sec": out["total_wall_sec"], "out": args.out}))


if __name__ == "__main__":
    main()
