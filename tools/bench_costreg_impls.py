#!/usr/bin/env python3
"""End-to-end 3D-regularizer timing: conv3d_impl='xla' vs 'banded'.

Times the family regularizer MODULES (mvsnet CostRegNet, vis_mvsnet Reg,
cvp CostRegNet) at their production volume shapes with the
tunnel-amortized harness, and checks output agreement between impls.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(args):
    import jax
    import jax.numpy as jnp

    from robustmvd_tpu.utils.platform import enable_compilation_cache
    from robustmvd_tpu.utils.profiler import time_fn

    enable_compilation_cache()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)

    def build(kind, impl):
        if kind == "mvsnet":
            from robustmvd_tpu.models.blocks.mvsnet import CostRegNet

            return CostRegNet(dtype=dtype, conv3d_impl=impl), (1, 256, 64, 80, 32)
        if kind == "vis":
            from robustmvd_tpu.models.blocks.vis_mvsnet import Reg

            # stage-1 volume for a 256x320 input: D=64 at 1/8 res, 8 groups
            return Reg(dtype=dtype, conv3d_impl=impl), (1, 64, 32, 40, 8)
        from robustmvd_tpu.models.blocks.cvp_mvsnet import CostRegNet as CvpReg

        return CvpReg(dtype=dtype, conv3d_impl=impl), (1, 32, 64, 80, 16)

    for kind in args.modules:
        ref_out = None
        variables = None
        x = None
        for impl in ("xla", "banded"):
            mod, shape = build(kind, impl)
            if x is None:
                x = jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
            if variables is None:
                variables = mod.init(jax.random.PRNGKey(0), x)
            fn = lambda v, xi: mod.apply(v, xi)
            out = np.asarray(jax.jit(fn)(variables, x), np.float32)
            if ref_out is None:
                ref_out, err = out, 0.0
            else:
                err = float(np.max(np.abs(out - ref_out)) / (np.max(np.abs(ref_out)) + 1e-12))

            K = args.reps
            xs = tuple(
                jnp.asarray(np.random.RandomState(2 + i).randn(*shape).astype(np.float32), dtype)
                for i in range(K)
            )

            def many(v, xs_):
                return sum(jnp.sum(mod.apply(v, xi), dtype=jnp.float32) for xi in xs_)

            sec = time_fn(jax.jit(many), variables, xs, iters=args.iters, burn_in=3) / K
            print(
                json.dumps(
                    {
                        "module": kind,
                        "impl": impl,
                        "ms": round(sec * 1e3, 3),
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
    p.add_argument("--modules", nargs="+", default=["mvsnet", "vis", "cvp"])
    main(p.parse_args())
