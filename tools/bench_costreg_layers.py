#!/usr/bin/env python3
"""Per-layer device-time map of the full MVSNet CostRegNet (xla lowering).

Complements bench_conv3d_strategies.py: measures EVERY layer — stride-2
encoders and ConvTranspose3d decoders included — with the tunnel-amortized
harness (K pre-staged inputs per dispatch, scalar fetch), so the packed-
conv work targets the layers that actually dominate the 25 ms stage time.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (name, input shape, Cout, kind)  — volume for a 256x320 input, D=256
LAYERS = [
    ("conv0", (1, 256, 64, 80, 32), 8, "s1"),
    ("conv1", (1, 256, 64, 80, 8), 16, "s2"),
    ("conv2", (1, 128, 32, 40, 16), 16, "s1"),
    ("conv3", (1, 128, 32, 40, 16), 32, "s2"),
    ("conv4", (1, 64, 16, 20, 32), 32, "s1"),
    ("conv5", (1, 64, 16, 20, 32), 64, "s2"),
    ("conv6", (1, 32, 8, 10, 64), 64, "s1"),
    ("deconv7", (1, 32, 8, 10, 64), 32, "up"),
    ("deconv9", (1, 64, 16, 20, 32), 16, "up"),
    ("deconv11", (1, 128, 32, 40, 16), 8, "up"),
    ("prob", (1, 256, 64, 80, 8), 1, "s1"),
]


def main(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from robustmvd_tpu.utils.platform import enable_compilation_cache
    from robustmvd_tpu.utils.profiler import time_fn

    enable_compilation_cache()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    total = 0.0

    from robustmvd_tpu.ops.conv3d import (
        conv3d_dz2d,
        conv3d_packed,
        conv3d_transposed_dz2d,
    )

    for name, shape, Co, kind in LAYERS:
        B, D, H, W, C = shape
        k_np = (rng.randn(3, 3, 3, C, Co) * (27 * C) ** -0.5).astype(np.float32)
        k = jnp.asarray(k_np, dtype)
        if args.impl == "dz2d":
            if kind == "s1":
                fn = lambda x, k: conv3d_dz2d(x, k, stride=1)
            elif kind == "s2":
                fn = lambda x, k: conv3d_dz2d(x, k, stride=2)
            else:
                fn = lambda x, k: conv3d_transposed_dz2d(
                    x, k, stride=2, output_padding=1
                )
        elif args.impl == "banded" and kind == "s1":
            fn = lambda x, k: conv3d_packed(x, k, banded=True)
        elif kind == "s1":
            fn = lambda x, k: lax.conv_general_dilated(
                x, k, (1, 1, 1), ((1, 1),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        elif kind == "s2":
            fn = lambda x, k: lax.conv_general_dilated(
                x, k, (2, 2, 2), ((1, 1),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        else:  # torch ConvTranspose3d k3 s2 p1 op1 == input-dilated conv
            fn = lambda x, k: lax.conv_general_dilated(
                x, k, (1, 1, 1), ((1, 2),) * 3, lhs_dilation=(2, 2, 2),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        K = args.reps
        xs = tuple(
            jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
            for _ in range(K)
        )

        def many(xs_, kk, fn=fn):
            return sum(jnp.sum(fn(xi, kk), dtype=jnp.float32) for xi in xs_)

        jm = jax.jit(many)
        sec = time_fn(jm, xs, k, iters=args.iters, burn_in=3) / K
        total += sec
        out_vox = B * D * H * W * (1 if kind == "s1" else (8 if kind == "up" else 1 / 8))
        flops = 2 * 27 * C * Co * out_vox
        print(
            json.dumps(
                {
                    "layer": name,
                    "kind": kind,
                    "ms": round(sec * 1e3, 3),
                    "useful_mfu_pct": round(100 * flops / sec / 197e12, 2),
                }
            ),
            flush=True,
        )
    print(json.dumps({"layer": "TOTAL_convs", "ms": round(total * 1e3, 3)}), flush=True)



if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--impl", default="xla", choices=["xla", "banded", "dz2d"])
    main(p.parse_args())
