#!/usr/bin/env python3
"""Stride-2 3D conv: XLA direct vs banded packing, CostRegNet shapes."""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LAYERS = [
    ("conv1", (1, 256, 64, 80, 8), 16),
    ("conv3", (1, 128, 32, 40, 16), 32),
    ("conv5", (1, 64, 16, 20, 32), 64),
]


def main(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from robustmvd_tpu.ops.conv3d import conv3d_packed_s2
    from robustmvd_tpu.utils.platform import enable_compilation_cache
    from robustmvd_tpu.utils.profiler import time_fn

    enable_compilation_cache()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)

    def xla(x, k):
        return lax.conv_general_dilated(
            x, k, (2, 2, 2), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    for name, shape, Co in LAYERS:
        B, D, H, W, C = shape
        k = jnp.asarray(
            (rng.randn(3, 3, 3, C, Co) * (27 * C) ** -0.5).astype(np.float32), dtype
        )
        x0 = jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
        K = args.reps
        xs = tuple(
            jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
            for _ in range(K)
        )
        ref = np.asarray(xla(x0, k), np.float32)
        flops = 2 * 27 * C * Co * B * (D // 2) * (H // 2) * (W // 2)

        for sname, fn in [("xla", xla)] + [
            (f"banded_s2_t{t}", (lambda t: (lambda x, kk: conv3d_packed_s2(x, kk, tile=t)))(t))
            for t in args.tiles
        ]:
            got = np.asarray(jax.jit(fn)(x0, k), np.float32)
            err = float(np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-12))

            def many(xs_, kk, fn=fn):
                return sum(jnp.sum(fn(xi, kk), dtype=jnp.float32) for xi in xs_)

            sec = time_fn(jax.jit(many), xs, k, iters=args.iters, burn_in=3) / K
            print(
                json.dumps(
                    {
                        "layer": name,
                        "strategy": sname,
                        "ms": round(sec * 1e3, 3),
                        "useful_mfu_pct": round(100 * flops / sec / 197e12, 2),
                        "rel_err_vs_xla": round(err, 5),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--tiles", nargs="+", type=int, default=[6, 14])
    main(p.parse_args())
