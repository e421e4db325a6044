#!/usr/bin/env python3
"""Scaling benchmark: frames/s of the robust_mvd forward under data-parallel

sharding at increasing device counts. On a multi-chip slice this measures
real ICI scaling (target: >=80% linear, BASELINE.md north star); on a
single chip it measures batch-throughput scaling; with
--xla_force_host_platform_device_count it validates the sharded path on
virtual CPU devices.

Prints one JSON line per configuration.
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from robustmvd_tpu.models import create_model
    from robustmvd_tpu.parallel import MeshSpec, make_mesh
    from robustmvd_tpu.parallel.context import use_mesh
    from robustmvd_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    devices = jax.devices()
    if args.platform:
        devices = jax.devices(args.platform)

    model = create_model(
        "robust_mvd", pretrained=False, weights=None, remat=False,
        num_sampling_points=args.num_sampling_points,
    )
    V, H, W = 3, args.height, args.width
    rng = np.random.RandomState(0)

    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= len(devices)]
    base_fps = None

    for n in counts:
        mesh = make_mesh(MeshSpec(data=n), devices=devices[:n])
        B = n * args.per_device_batch

        images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32) - 0.4)
        poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
        poses[:, 1:, 0, 3] = 0.1
        intr = np.tile(
            np.array([[0.8, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], dtype=np.float32),
            (B, V, 1, 1),
        )
        kv = np.zeros((B,), np.int32)

        batched = NamedSharding(mesh, P("data"))
        images = jax.device_put(images, batched)
        poses = jax.device_put(jnp.asarray(poses), batched)
        intr = jax.device_put(jnp.asarray(intr), batched)
        kv = jax.device_put(jnp.asarray(kv), batched)

        with use_mesh(mesh):
            fwd = jax.jit(
                lambda v, im, po, K, k: jnp.sum(
                    model.module.apply(v, im, po, K, k)[0]["depth"]
                )
            )
            float(fwd(model.variables, images, poses, intr, kv))  # compile
            for _ in range(3):
                float(fwd(model.variables, images, poses, intr, kv))
            iters = args.iters
            start = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fwd(model.variables, images, poses, intr, kv)
            float(out)
            elapsed = time.perf_counter() - start

        fps = iters * B / elapsed
        if base_fps is None:
            base_fps = fps
        print(
            json.dumps(
                {
                    "metric": f"robust_mvd_fwd_scaling_n{n}",
                    "value": round(fps, 3),
                    "unit": "frames/s",
                    "devices": n,
                    "scaling_efficiency": round(fps / (base_fps * n), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=384)
    parser.add_argument("--width", type=int, default=1280)
    parser.add_argument("--per_device_batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--platform", help="cpu | tpu (default: default backend)")
    parser.add_argument("--num_sampling_points", type=int, default=256,
                        help="Plane-sweep hypotheses (use a small value for CPU-mesh validation).")
    main(parser.parse_args())
