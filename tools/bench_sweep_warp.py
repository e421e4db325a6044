"""Parity + timing for the fused banded warp+variance kernel vs the
XLA homo_warp + variance path, at mvsnet bench shapes.

Run: python tools/bench_sweep_warp.py [--dtype float32|bfloat16]
     [--dc 16] [--band 8] [--small] (small shapes, CPU-interpret OK)
"""

import argparse
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

from robustmvd_tpu.ops.homography import homo_warp
from robustmvd_tpu.ops.pallas.sweep_warp import warp_variance
from robustmvd_tpu.utils.profiler import force_fetch


def timeit(fn, *args, iters=20, burnin=3):
    force_fetch(fn(*args))
    for _ in range(burnin):
        out = fn(*args)
    force_fetch(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_fetch(out)
    return (time.perf_counter() - start) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dc", type=int, default=16)
    ap.add_argument("--band", type=int, default=8)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    if args.small:
        B, V, h, w, C, D = 1, 2, 16, 24, 8, 12
    else:
        B, V, h, w, C, D = 1, 2, 64, 80, 32, 256
    H, W = h * 4, w * 4

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16 if args.dtype in ("bfloat16", "bf16") else jnp.float32

    ref_feat = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32), dtype=dt)
    src_feats = jnp.asarray(rng.randn(B, V, h, w, C).astype(np.float32), dtype=dt)

    poses = np.tile(np.eye(4, dtype=np.float32), (B, V + 1, 1, 1))
    for i in range(1, V + 1):
        poses[:, i, 0, 3] = 0.1 * i
        poses[:, i, 1, 3] = 0.05 * i
    K = np.array(
        [[W * 0.8 * 0.25, 0, w / 2], [0, W * 0.8 * 0.25, h / 2], [0, 0, 1]],
        np.float32,
    )
    proj = np.tile(np.eye(4, dtype=np.float32), (B, V + 1, 1, 1))
    for i in range(V + 1):
        proj[:, i, :3, :4] = K @ poses[:, i, :3, :4]
    proj = jnp.asarray(proj)
    ref_proj_inv = jnp.linalg.inv(proj[:, 0])
    src_projs = proj[:, 1:]
    depth_values = jnp.broadcast_to(
        jnp.linspace(0.5, 10.0, D, dtype=jnp.float32)[None], (B, D)
    )

    @jax.jit
    def xla_path(ref_feat, src_feats):
        ref_volume = jnp.broadcast_to(
            ref_feat[:, None], (B, D, h, w, C)
        ).astype(jnp.float32)
        vsum = ref_volume
        vsq = vsum**2

        def add_view(carry, view):
            s, q = carry
            sf, sp = view
            warped = homo_warp(sf, sp, ref_proj_inv, depth_values)
            warped = jax.lax.optimization_barrier(warped).astype(jnp.float32)
            return (s + warped, q + warped**2), None

        (vsum, vsq), _ = jax.lax.scan(
            add_view,
            (vsum, vsq),
            (jnp.moveaxis(src_feats, 1, 0), jnp.moveaxis(src_projs, 1, 0)),
        )
        n = V + 1.0
        return vsq / n - (vsum / n) ** 2

    @jax.jit
    def pallas_path(ref_feat, src_feats):
        return warp_variance(
            ref_feat, src_feats, src_projs, ref_proj_inv, depth_values,
            dc=args.dc, band=args.band,
        )

    a = np.asarray(xla_path(ref_feat, src_feats))
    b = np.asarray(pallas_path(ref_feat, src_feats))
    scale = np.abs(a).max()
    err = np.abs(a - b).max() / scale
    print(f"shapes ok: {a.shape} vs {b.shape}; rel max err = {err:.2e} (scale {scale:.3f})")

    if not args.no_time:
        t_x = timeit(lambda r, s: jnp.sum(xla_path(r, s)), ref_feat, src_feats)
        t_p = timeit(lambda r, s: jnp.sum(pallas_path(r, s)), ref_feat, src_feats)
        print(f"xla    {t_x:8.2f} ms")
        print(f"pallas {t_p:8.2f} ms   ({t_x / t_p:.2f}x)")


if __name__ == "__main__":
    main()
