"""Production-shape eval protocol on the real chip.

Runs the full RobustMultiViewDepthBenchmark loop — quasi-optimal view
ordering, the 1..V source-view sweep, uncertainty/AUSE, clipping, pandas
outputs — at the five published input sizes (ETH3D 768x1152, KITTI
384x1280, DTU 896x1216, ScanNet 448x640, T&T 704x1280; reference:
eval_all.sh:53) with synthetic stand-in datasets that match each
benchmark's real view count and key-view index (real data needs zero-
egress downloads; the protocol *shapes* are what this exercises).

Captures per dataset: mean runtime_model_in_msec (burn-in excluded, the
reference's measurement rule, multi_view_depth_evaluation.py:549-581),
peak device memory, and the number of XLA backend compiles (shape-bucket
count) observed during the run.

Used by bench.py (eval-protocol section) and runnable standalone:
  python tools/bench_eval_protocol.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

# (name, (H, W), num_views, keyview_idx) — sizes from eval_all.sh:53,
# view counts from the bundled sample lists (SURVEY.md §2.4)
PROTOCOL = [
    ("kitti", (384, 1280), 21, 10),
    ("dtu", (896, 1216), 11, 0),
    ("scannet", (448, 640), 8, 3),
    ("tanks_and_temples", (704, 1280), 11, 0),
    ("eth3d", (768, 1152), 11, 0),
]


def run_protocol(model=None, samples=4, burn_in=2, dtype="bfloat16", verbose=False):
    import jax

    from robustmvd_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from robustmvd_tpu.data.synthetic import SyntheticMVD
    from robustmvd_tpu.eval.multi_view_depth_evaluation import (
        MultiViewDepthEvaluation,
    )
    from robustmvd_tpu.models import create_model

    if model is None:
        model = create_model(
            "robust_mvd", pretrained=False, weights=None, dtype=dtype
        )

    compile_count = [0]

    def _on_event(event, duration, **kwargs):
        if "backend_compile" in event:
            compile_count[0] += 1

    try:
        jax.monitoring.register_event_duration_secs_listener(_on_event)
        have_monitor = True
    except Exception:
        have_monitor = False

    rows = []
    for name, (H, W), V, key_idx in PROTOCOL:
        dataset = SyntheticMVD(
            num_samples=samples,
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
            verbose=verbose,
        )
        compiles_before = compile_count[0]
        start = time.time()
        result = evaluation(
            dataset=dataset,
            model=model,
            burn_in_samples=burn_in,
        )
        wall = time.time() - start
        compiles = compile_count[0] - compiles_before if have_monitor else None

        rt_cols = result.loc[:, (slice(None), "runtime_model_in_msec")]
        rt = float(rt_cols.mean().mean())
        mem_gb = None
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "peak_bytes_in_use" in stats:
                mem_gb = round(stats["peak_bytes_in_use"] / 2**30, 3)
        except Exception:
            pass
        if mem_gb is None:
            # runtime stats unavailable (tunneled backend): take the max of
            # the engine's per-sample compile-time memory analysis column
            try:
                mem_col = result.loc[:, (slice(None), "device_mem_peak_in_mib")]
                peak_mib = float(mem_col.max().max())
                if peak_mib == peak_mib:  # not NaN
                    mem_gb = round(peak_mib / 1024, 3)
            except Exception:
                pass

        rows.append(
            {
                "metric": f"eval_protocol_{name}_{H}x{W}_{V}views",
                "value": round(rt, 3),
                "unit": "msec_model_per_run",
                "wall_sec_total": round(wall, 1),
                "samples": samples,
                "view_sweep": f"1..{V - 1}",
                "view_ordering": "quasi-optimal",
                "ause": float(
                    result.loc[:, (slice(None), "ause")].mean().mean()
                ),
                "peak_hbm_gb": mem_gb,
                "xla_compiles": compiles,
                "dtype": dtype,
            }
        )
    return rows


if __name__ == "__main__":
    for row in run_protocol(verbose=os.environ.get("VERBOSE", "") == "1"):
        print(json.dumps(row), flush=True)
