#!/usr/bin/env python3
"""Benchmark suite: per-family forward + train-step throughput on one chip.

Prints ONE JSON line. The top-level fields are the headline metric
(robust_mvd forward at the KITTI eval shape, continuing the BENCH_r01/r02
series); the "all" field carries every captured workload:

- robust_mvd forward, 384x1280, 1+2 views, S=256 — bfloat16 and float32
- robust_mvd train step, paper recipe (batch 4, 1+4 views, 384x768,
  loss+grads+clip+adam+schedule in one program), bfloat16
- mvsnet_train / vis_mvsnet / cvp_mvsnet forwards at 256x320, 1+2 views

Each entry reports frames/s (or samples/s), ms per frame, and an MFU
estimate = XLA cost-analysis FLOPs / device time / chip peak (bf16 peak;
fp32 workloads therefore read low by construction — noted per entry).

Protocol mirrors the reference's runtime measurement
(rmvd/eval/multi_view_depth_evaluation.py:549-572): batch size 1 for the
eval-shape forwards, burn-in iterations excluded, model-only time.
Execution is forced with a host fetch of the output scalar —
block_until_ready does NOT sync on the tunneled backend (PARITY.md).

vs_baseline: the reference repo publishes no runtime table
(BASELINE.json "published": {}); the proxy is 0.28 s/frame, the
GPU-class runtime of the reference model under the paper-of-record's
protocol (arXiv:2209.06681, batch 1, KITTI eval size). Indicative only.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np

# bf16 peak matmul FLOP/s per chip by device kind substring. MFU for fp32
# workloads is still computed against this bf16 peak (the MXU's native
# rate), so fp32 MFU is a utilization-of-the-chip number, not
# utilization-of-an-fp32-peak.
_PEAK_FLOPS = (
    ("v5 lite", 197e12),
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v4", 275e12),
    ("v6", 918e12),
)

_BASELINE_SEC_PER_FRAME = 0.28


def _peak_flops(device_kind):
    kind = device_kind.lower()
    for sub, peak in _PEAK_FLOPS:
        if sub in kind:
            return peak
    return None


def _cost_flops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _timeit(run_iter, iters=15, burn_in=3):
    """Async-dispatch timing: compile+burn-in excluded, all timed iterations

    dispatched back-to-back, one final scalar fetch bounds the in-order
    device queue (amortizes the tunnel round-trip)."""
    float(run_iter(0))  # compile
    for i in range(burn_in):
        float(run_iter(i + 1))
    start = time.perf_counter()
    out = None
    for i in range(iters):
        out = run_iter(i + 100)
    float(out)
    return (time.perf_counter() - start) / iters


def _mk_inputs(B, V, H, W, rng, rel_intrinsics=True):
    import jax.numpy as jnp

    images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32) - 0.4)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for i in range(1, V):
        poses[:, i, 0, 3] = 0.1 * i
    if rel_intrinsics:
        K = np.array([[0.8, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], dtype=np.float32)
    else:
        K = np.array(
            [[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]], dtype=np.float32
        )
    intrinsics = np.tile(K, (B, V, 1, 1))
    return images, jnp.asarray(poses), jnp.asarray(intrinsics), jnp.zeros((B,), jnp.int32)


def _bench_forward(name, model, sample, peak, iters=15):
    """Time model.apply_fn over a prepared device sample; returns an entry."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd_sum(variables, sample, salt):
        s = dict(sample)
        # salt varies per iteration so no dispatch can be elided/reused
        s["images"] = s["images"] + salt
        pred, aux = model.apply_fn(variables, **s)
        return jnp.sum(pred["depth"].astype(jnp.float32))

    salts = [jax.device_put(jnp.float32(i) * 1e-6) for i in range(200)]
    jax.block_until_ready(salts)
    variables = model.variables

    def run_iter(i):
        return fwd_sum(variables, sample, salts[i % 200])

    sec = _timeit(run_iter, iters=iters)
    flops = _cost_flops(fwd_sum, variables, sample, salts[0])
    B = int(sample["images"].shape[0])
    entry = {
        "metric": name,
        "value": round(B / sec, 3),
        "unit": "frames/s",
        "msec_per_frame": round(1000 * sec / B, 3),
    }
    if flops and peak:
        entry["mfu"] = round(flops / sec / peak, 4)
        entry["tflops_per_frame"] = round(flops / B / 1e12, 3)
    return entry


def _bench_robust_mvd_forward(dtype, peak, rng):
    from robustmvd_tpu.models import create_model

    model = create_model(
        "robust_mvd", pretrained=False, weights=None, remat=False, dtype=dtype
    )
    B, V, H, W = 1, 3, 384, 1280
    images, poses, intrinsics, keyview_idx = _mk_inputs(B, V, H, W, rng)
    sample = {
        "images": images,
        "poses": poses,
        "intrinsics": intrinsics,
        "keyview_idx": keyview_idx,
    }
    entry = _bench_forward(
        f"robust_mvd_forward_384x1280_3views_{dtype}", model, sample, peak, iters=20
    )
    if dtype == "float32":
        entry["note"] = "bit-parity configuration; MFU vs bf16 peak"
    return entry


def _bench_train_step(peak, rng):
    """Paper recipe (train_all.sh:49): batch 4, 1+4 views, 384x768,

    loss + grads + clip(5) + adam(1e-4) + flownet schedule, one program."""
    import jax
    import jax.numpy as jnp

    from robustmvd_tpu.loss import create_loss
    from robustmvd_tpu.models import create_model
    from robustmvd_tpu.optim import create_optimizer, create_scheduler
    from robustmvd_tpu.optim.factory import build_optax

    dtype = "bfloat16"
    B, V, H, W = 4, 5, 384, 768
    model = create_model(
        "robust_mvd", pretrained=False, weights=None, train=True,
        remat=False, dtype=dtype,
    )
    loss_obj = create_loss("robust_mvd_loss", model=model)
    opt_spec = create_optimizer("adam", model=model, lr=1e-4)
    sched_spec = create_scheduler("flownet_scheduler", optimizer=opt_spec)
    tx, _ = build_optax(opt_spec, sched_spec, grad_clip_max_norm=5.0)

    images, poses, intrinsics, keyview_idx = _mk_inputs(B, V, H, W, rng)
    sample_inputs = {
        "images": images,
        "poses": poses,
        "intrinsics": intrinsics,
        "keyview_idx": keyview_idx,
    }
    sample_gt = {
        "invdepth": jnp.asarray(
            (1.0 / (1.0 + 99.0 * rng.rand(B, H, W, 1))).astype(np.float32)
        )
    }
    variables = model.variables
    state = {
        "variables": variables,
        "opt_state": tx.init(variables["params"]),
        "step": jnp.asarray(0, jnp.int32),
    }

    @jax.jit
    def step_fn(state, sample_inputs, sample_gt, salt):
        variables = state["variables"]
        si = dict(sample_inputs)
        si["images"] = si["images"] + salt

        def loss_fn(params):
            vars_in = dict(variables)
            vars_in["params"] = params
            pred, aux = model.apply_fn(vars_in, **si)
            total, _, _ = loss_obj(
                si, sample_gt, pred, aux, iteration=state["step"], params=params
            )
            return total

        total, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, new_opt = tx.update(grads, state["opt_state"], variables["params"])
        new_params = jax.tree.map(lambda p, u: p + u, variables["params"], updates)
        new_vars = dict(variables)
        new_vars["params"] = new_params
        new_state = {
            "variables": new_vars,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }
        return new_state, total

    salts = [jax.device_put(jnp.float32(i) * 1e-6) for i in range(200)]
    jax.block_until_ready(salts)

    # state is updated in-place across iterations (donation-free but the
    # timing is identical); the returned loss scalar is the fetch target
    holder = {"state": state}

    def run_iter(i):
        holder["state"], total = step_fn(
            holder["state"], sample_inputs, sample_gt, salts[i % 200]
        )
        return total

    sec = _timeit(run_iter, iters=12)
    flops = _cost_flops(step_fn, state, sample_inputs, sample_gt, salts[0])
    entry = {
        "metric": f"robust_mvd_train_step_b{B}_384x768_5views_{dtype}",
        "value": round(B / sec, 3),
        "unit": "samples/s",
        "msec_per_step": round(1000 * sec, 3),
    }
    if flops and peak:
        entry["mfu"] = round(flops / sec / peak, 4)
        entry["tflops_per_step"] = round(flops / 1e12, 3)
    return entry


def _bench_vis_train_step(peak, rng):
    """vis_mvsnet training step (the second trainable model): batch 2,
    1+2 views, 256x320, vismvsnet_loss + grads + adam, one program.
    BatchNorm runs in running-average mode (frozen-BN training,
    tests/test_vis_mvsnet_parity.py)."""
    import jax
    import jax.numpy as jnp

    from robustmvd_tpu.loss import create_loss
    from robustmvd_tpu.models import create_model
    from robustmvd_tpu.optim import create_optimizer, create_scheduler
    from robustmvd_tpu.optim.factory import build_optax

    dtype = "bfloat16"
    B, V, H, W = 2, 3, 256, 320
    model = create_model(
        "vis_mvsnet", pretrained=False, weights=None, train=True, dtype=dtype
    )
    loss_obj = create_loss("vismvsnet_loss")
    opt_spec = create_optimizer("adam", model=model, lr=1e-3)
    sched_spec = create_scheduler("mvsnet_scheduler", optimizer=opt_spec)
    tx, _ = build_optax(opt_spec, sched_spec, grad_clip_max_norm=None)

    images, poses, intrinsics, keyview_idx = _mk_inputs(
        B, V, H, W, rng, rel_intrinsics=False
    )
    depth_range = (jnp.full((B,), 2.0), jnp.full((B,), 10.0))
    sample_inputs = {
        "images": images,
        "poses": poses,
        "intrinsics": intrinsics,
        "keyview_idx": keyview_idx,
        "depth_range": depth_range,
    }
    sample_gt = {
        "depth": jnp.asarray((2.0 + 7.0 * rng.rand(B, H, W, 1)).astype(np.float32))
    }
    variables = model.variables
    state = {
        "variables": variables,
        "opt_state": tx.init(variables["params"]),
        "step": jnp.asarray(0, jnp.int32),
    }

    @jax.jit
    def step_fn(state, sample_inputs, sample_gt, salt):
        variables = state["variables"]
        si = dict(sample_inputs)
        si["images"] = si["images"] + salt

        def loss_fn(params):
            vars_in = dict(variables)
            vars_in["params"] = params
            pred, aux = model.apply_fn(vars_in, **si)
            total, _, _ = loss_obj(
                si, sample_gt, pred, aux, iteration=state["step"], params=params
            )
            return total

        total, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, new_opt = tx.update(grads, state["opt_state"], variables["params"])
        new_params = jax.tree.map(lambda p, u: p + u, variables["params"], updates)
        new_vars = dict(variables)
        new_vars["params"] = new_params
        new_state = {
            "variables": new_vars,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }
        return new_state, total

    salts = [jax.device_put(jnp.float32(i) * 1e-6) for i in range(200)]
    jax.block_until_ready(salts)
    holder = {"state": state}

    def run_iter(i):
        holder["state"], total = step_fn(
            holder["state"], sample_inputs, sample_gt, salts[i % 200]
        )
        return total

    sec = _timeit(run_iter, iters=10)
    flops = _cost_flops(step_fn, state, sample_inputs, sample_gt, salts[0])
    entry = {
        "metric": f"vis_mvsnet_train_step_b{B}_256x320_3views_{dtype}",
        "value": round(B / sec, 3),
        "unit": "samples/s",
        "msec_per_step": round(1000 * sec, 3),
    }
    if flops and peak:
        entry["mfu"] = round(flops / sec / peak, 4)
        entry["tflops_per_step"] = round(flops / 1e12, 3)
    return entry


def _bench_eval_protocol():
    """The published five-dataset eval protocol at production shapes
    (quasi-optimal ordering, 1..V sweep, AUSE) on synthetic stand-ins —
    per-dataset model runtime / peak HBM / XLA compile counts."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from bench_eval_protocol import run_protocol

    return run_protocol(samples=3, burn_in=2)


def _bench_family(name, peak, rng, dtype=None, V=3, H=256, W=320):
    """MVSNet-family forward via the model's own input_adapter."""
    from robustmvd_tpu.models import create_model

    kwargs = {} if dtype is None else {"dtype": dtype}
    model = create_model(name, pretrained=False, weights=None, **kwargs)
    B = 1
    images = [rng.rand(B, 3, H, W).astype(np.float32) * 255.0 for _ in range(V)]
    K = np.array(
        [[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]], dtype=np.float32
    )
    intrinsics = [np.tile(K, (B, 1, 1)) for _ in range(V)]
    poses = [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))]
    for i in range(1, V):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1 * i
        poses.append(np.tile(T, (B, 1, 1)))
    depth_range = (np.full((B,), 0.4, np.float32), np.full((B,), 100.0, np.float32))
    sample = model.input_adapter(
        images=images,
        keyview_idx=np.zeros((B,), np.int64),
        poses=poses,
        intrinsics=intrinsics,
        depth_range=depth_range,
    )
    suffix = f"_{dtype}" if dtype else ""
    return _bench_forward(
        f"{name}_forward_{H}x{W}_{V}views{suffix}", model, sample, peak, iters=15
    )


def main():
    import jax

    from robustmvd_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    device_kind = jax.devices()[0].device_kind
    peak = _peak_flops(device_kind)
    rng = np.random.RandomState(0)

    only = os.environ.get("BENCH_ONLY")  # comma-separated substrings
    headline_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    workloads = [
        ("robust_mvd_bf16", lambda: _bench_robust_mvd_forward("bfloat16", peak, rng)),
        ("robust_mvd_fp32", lambda: _bench_robust_mvd_forward("float32", peak, rng)),
        ("train_step", lambda: _bench_train_step(peak, rng)),
        ("mvsnet", lambda: _bench_family("mvsnet_train", peak, rng)),
        ("mvsnet_bf16", lambda: _bench_family("mvsnet_train", peak, rng, dtype="bfloat16")),
        ("vis_mvsnet", lambda: _bench_family("vis_mvsnet", peak, rng)),
        ("vis_mvsnet_bf16", lambda: _bench_family("vis_mvsnet", peak, rng, dtype="bfloat16")),
        ("cvp_mvsnet", lambda: _bench_family("cvp_mvsnet", peak, rng)),
        ("cvp_mvsnet_bf16", lambda: _bench_family("cvp_mvsnet", peak, rng, dtype="bfloat16")),
        ("vis_train_step", lambda: _bench_vis_train_step(peak, rng)),
    ]
    if os.environ.get("RMVD_BENCH_EVAL_PROTOCOL", "1") != "0":
        workloads.append(("eval_protocol", _bench_eval_protocol))

    entries = []
    for key, fn in workloads:
        if only and not any(s in key for s in only.split(",")):
            continue
        try:
            result = fn()
            entries.extend(result if isinstance(result, list) else [result])
        except Exception as e:  # capture, don't abort the suite
            entries.append({"metric": key, "error": f"{type(e).__name__}: {e}"})

    headline_metric = (
        "robust_mvd_forward_384x1280_3views_bfloat16"
        if headline_dtype == "bfloat16"
        else "robust_mvd_forward_384x1280_3views_float32"
    )
    headline = next(
        (e for e in entries if e.get("metric") == headline_metric and "value" in e),
        next((e for e in entries if "value" in e), None),
    )
    baseline_fps = 1.0 / _BASELINE_SEC_PER_FRAME
    out = {
        # headline keeps the BENCH_r01/r02 metric name for series continuity
        "metric": "robust_mvd_forward_384x1280_3views",
        "value": headline["value"] if headline else None,
        "unit": "frames/s",
        "vs_baseline": round(headline["value"] / baseline_fps, 3) if headline else None,
        "device_kind": device_kind,
        "all": entries,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
