"""Train-step throughput at the paper recipe shape on the real chip.

Builds the same fully-jitted step as the training engine (forward + loss
+ grads + clip + adam + schedule; multi_view_depth_training.py:164-223)
at the reference recipe (train_all.sh:49: batch 4, 1 key + 4 source
views, 384x768 crops, robust_mvd_loss, grad clip 5) and times it with
the float-fetch pattern (block_until_ready does not sync on the tunneled
backend).

Knobs: BENCH_DTYPE=float32|bfloat16, BENCH_IMPL=pixelscan|matmul,
BENCH_REMAT=1|0, BENCH_BATCH=4.
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

from robustmvd_tpu.loss import create_loss
from robustmvd_tpu.models import create_model
from robustmvd_tpu.optim import create_optimizer, create_scheduler
from robustmvd_tpu.optim.factory import build_optax


def main():
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    impl = os.environ.get("BENCH_IMPL", "pixelscan")
    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    B = int(os.environ.get("BENCH_BATCH", "4"))
    V, H, W = 5, 384, 768

    model = create_model(
        "robust_mvd", pretrained=False, weights=None, train=True,
        corr_impl=impl, remat=remat, dtype=dtype,
    )
    loss_obj = create_loss("robust_mvd_loss", model=model)
    opt_spec = create_optimizer("adam", model=model, lr=1e-4)
    sched_spec = create_scheduler("flownet_scheduler", optimizer=opt_spec)
    tx, _ = build_optax(opt_spec, sched_spec, grad_clip_max_norm=5.0)

    rng = np.random.RandomState(0)
    sample_inputs = {
        "images": jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32) - 0.4),
        "poses": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
            + rng.randn(B, V, 4, 4).astype(np.float32) * 1e-3
        ),
        "intrinsics": jnp.asarray(
            np.tile(
                np.array(
                    [[0.8, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], dtype=np.float32
                ),
                (B, V, 1, 1),
            )
        ),
        "keyview_idx": jnp.zeros((B,), jnp.int32),
    }
    sample_gt = {
        "invdepth": jnp.asarray(
            (1.0 / (1.0 + 99.0 * rng.rand(B, H, W, 1))).astype(np.float32)
        ),
    }

    variables = model.variables
    state = {
        "variables": variables,
        "opt_state": tx.init(variables["params"]),
        "step": jnp.asarray(0, jnp.int32),
    }

    import optax

    @jax.jit
    def step_fn(state, sample_inputs, sample_gt):
        variables = state["variables"]
        step = state["step"]

        def loss_fn(params):
            vars_in = dict(variables)
            vars_in["params"] = params
            pred, aux = model.apply_fn(vars_in, **sample_inputs)
            total, sub_losses, _ = loss_obj(
                sample_inputs, sample_gt, pred, aux, iteration=step, params=params
            )
            return total, sub_losses

        (total, sub), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, new_opt = tx.update(grads, state["opt_state"], variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        new_vars = dict(variables)
        new_vars["params"] = new_params
        return (
            {"variables": new_vars, "opt_state": new_opt, "step": step + 1},
            total,
        )

    t0 = time.perf_counter()
    state, total = step_fn(state, sample_inputs, sample_gt)
    float(total)
    print(f"compile+first step: {time.perf_counter()-t0:.1f} s")

    for _ in range(3):
        state, total = step_fn(state, sample_inputs, sample_gt)
    float(total)

    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        state, total = step_fn(state, sample_inputs, sample_gt)
    float(total)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"train step [{dtype} impl={impl} remat={remat} batch={B}]: "
        f"{dt*1e3:.1f} ms/step ({B/dt:.1f} samples/s; "
        f"600k iters = {600_000*dt/3600:.1f} h)"
    )


if __name__ == "__main__":
    main()
