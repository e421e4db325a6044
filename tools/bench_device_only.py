"""Device-only throughput: N forwards inside one lax.scan dispatch.

Separates pure TPU execution time from per-call host dispatch overhead
(the tunneled setup has slow host CPUs, so dispatch can be a visible share
of per-frame latency). Mirrors bench.py's workload.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np
import jax
import jax.numpy as jnp

from robustmvd_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

from robustmvd_tpu.models import create_model


def main():
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    model = create_model(
        "robust_mvd", pretrained=False, weights=None, remat=False, dtype=dtype
    )
    variables = model.variables
    mod = model.module

    B, V, H, W = 1, 3, 384, 1280
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32) - 0.4)
    poses_np = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for i in range(1, V):
        poses_np[:, i, 0, 3] = 0.1 * i
    intrinsics = jnp.asarray(
        np.tile(
            np.array([[0.8, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], dtype=np.float32),
            (B, V, 1, 1),
        )
    )
    poses = jnp.asarray(poses_np)
    keyview_idx = jnp.zeros((B,), jnp.int32)

    N = int(os.environ.get("BENCH_SCAN_ITERS", "20"))

    @jax.jit
    def scan_fwd(variables, images):
        def body(carry, salt):
            pred, _ = mod.apply(
                variables, images + salt, poses, intrinsics, keyview_idx
            )
            return carry + jnp.sum(pred["depth"]), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(N, dtype=jnp.float32) * 1e-6)
        return total

    float(scan_fwd(variables, images))  # compile
    float(scan_fwd(variables, images))  # warm
    start = time.perf_counter()
    float(scan_fwd(variables, images))
    elapsed = time.perf_counter() - start
    ms = elapsed / N * 1e3
    print(f"device-only: {ms:.2f} ms/frame ({1e3/ms:.1f} fps) over {N} scanned frames [{dtype}]")


if __name__ == "__main__":
    main()
