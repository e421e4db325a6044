"""Stage-level timing of the robust_mvd forward on TPU at bench shapes.

Times each stage of the flagship forward separately (encoder, context,
correlation, fusion, cost-volume encoder, decoder) to locate the remaining
hot spots. Run from the repo root: `python tools/profile_stages.py`.
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
from robustmvd_tpu.models.robust_mvd import split_key_sources
from robustmvd_tpu.models.blocks.dispnet import (
    DispnetContextEncoder,
    DispnetCostvolumeEncoder,
    DispnetDecoder,
    DispnetEncoder,
    LearnedFusion,
)
from robustmvd_tpu.ops.corr import planesweep_correlation


from robustmvd_tpu.utils.profiler import force_fetch


def timeit(fn, *args, iters=20, burnin=3):
    # execution is forced with a host fetch of one output leaf —
    # block_until_ready does NOT sync on the tunneled backend (PARITY.md)
    force_fetch(fn(*args))
    for _ in range(burnin):
        out = fn(*args)
    force_fetch(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_fetch(out)
    return (time.perf_counter() - start) / iters * 1e3  # ms


def scalarize(fn):
    """Jit a stage so the timed program returns ONE scalar (the tunnel
    fetch of a large stage output would otherwise dominate the timing);
    abs-sums keep every output contributing so nothing is DCE'd."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def g(*args):
        out = fn(*args)
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)

    return g


# v5e peaks: 197 TFLOP/s bf16 (98.5 f32), 819 GB/s HBM
_PEAK_FLOPS = {"bfloat16": 197e12, "bf16": 197e12}
_HBM_BW = 819e9


def stage_bound(fn, *args, dtype="float32"):
    """(flops, bytes, bound_ms) from XLA cost analysis of the jitted stage."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        peak = _PEAK_FLOPS.get(dtype, 98.5e12)
        bound = max(flops / peak, byts / _HBM_BW) * 1e3
        return flops, byts, bound
    except Exception:
        return 0.0, 0.0, 0.0


def report(name, t_ms, fn, *args, dtype="float32"):
    flops, byts, bound = stage_bound(fn, *args, dtype=dtype)
    ratio = t_ms / bound if bound > 0 else float("nan")
    print(
        f"{name:<22} {t_ms:8.2f} ms | {flops / 1e9:8.2f} GF {byts / 1e6:8.1f} MB"
        f" | bound {bound:6.2f} ms | {ratio:5.1f}x off"
    )


def main():
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    model = create_model(
        "robust_mvd", pretrained=False, weights=None, remat=False, dtype=dtype
    )
    variables = model.variables
    mod = model.module
    p = variables["params"]

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

    @jax.jit
    def full(variables, images):
        pred, aux = mod.apply(variables, images, poses, intrinsics, keyview_idx)
        return pred["depth"]

    t_full = timeit(full, variables, images)
    print(f"full forward           {t_full:8.2f} ms")

    import jax.numpy as _jnp

    cdt = _jnp.bfloat16 if dtype in ("bfloat16", "bf16") else _jnp.float32
    enc = DispnetEncoder(dtype=cdt, name="encoder")
    ctx_mod = DispnetContextEncoder(dtype=cdt, name="context_encoder")
    fus = LearnedFusion(dtype=cdt, name="fusion_block")
    cve = DispnetCostvolumeEncoder(dtype=cdt, name="fusion_enc_block")
    dec = DispnetDecoder(dtype=cdt, name="decoder")

    def stage_encoder(images):
        all_enc, _ = enc.apply({"params": p["encoder"]}, images.reshape(B * V, H, W, 3))
        return {k: v.reshape(B, V, *v.shape[1:]) for k, v in all_enc.items()}

    t_enc = timeit(scalarize(stage_encoder), images)
    all_enc = jax.jit(stage_encoder)(images)
    report(f"encoder ({V} views)", t_enc, scalarize(stage_encoder), images, dtype=dtype)

    conv1_key, _ = split_key_sources(all_enc["conv1"], keyview_idx)
    conv2_key, _ = split_key_sources(all_enc["conv2"], keyview_idx)
    enc_key, enc_sources = split_key_sources(all_enc["conv3a"], keyview_idx)
    K_key, K_sources = split_key_sources(intrinsics, keyview_idx)
    _, key_to_source = split_key_sources(poses, keyview_idx)

    def stage_context(enc_key):
        return ctx_mod.apply({"params": p["context_encoder"]}, enc_key)

    ctx = jax.jit(stage_context)(enc_key)
    t_ctx = timeit(scalarize(stage_context), enc_key)
    report("context encoder", t_ctx, scalarize(stage_context), enc_key, dtype=dtype)

    def stage_corr(enc_key, enc_sources):
        corrs, masks, _ = planesweep_correlation(
            feat_key=enc_key,
            feat_sources=enc_sources,
            intrinsics_key=K_key,
            intrinsics_sources=K_sources,
            key_to_source_transforms=key_to_source,
            num_sampling_points=256,
            min_depth=0.4,
            max_depth=1000.0,
            impl="pixelscan",
            slab_size=128,
        )
        return corrs, masks

    corrs, masks = jax.jit(stage_corr)(enc_key, enc_sources)
    t_corr = timeit(scalarize(stage_corr), enc_key, enc_sources)
    report("planesweep corr", t_corr, scalarize(stage_corr), enc_key, enc_sources, dtype=dtype)

    def stage_fusion(corrs, masks):
        return fus.apply({"params": p["fusion_block"]}, corrs, masks)

    fused = jax.jit(stage_fusion)(corrs, masks)
    t_fus = timeit(scalarize(stage_fusion), corrs, masks)
    report("learned fusion", t_fus, scalarize(stage_fusion), corrs, masks, dtype=dtype)

    fused_corr = fused[0]

    def stage_cve(fused_corr, ctx):
        return cve.apply({"params": p["fusion_enc_block"]}, corr=fused_corr, ctx=ctx)

    all_enc_fused, enc_fused = jax.jit(stage_cve)(fused_corr, ctx)
    t_cve = timeit(scalarize(stage_cve), fused_corr, ctx)
    report("costvolume encoder", t_cve, scalarize(stage_cve), fused_corr, ctx, dtype=dtype)

    def stage_dec(enc_fused, all_enc_fused, conv1_key, conv2_key):
        return dec.apply(
            {"params": p["decoder"]},
            enc_fused=enc_fused,
            all_enc={"conv1": conv1_key, "conv2": conv2_key, **all_enc_fused},
        )

    t_dec = timeit(scalarize(stage_dec), enc_fused, all_enc_fused, conv1_key, conv2_key)
    report("decoder", t_dec, scalarize(stage_dec), enc_fused, all_enc_fused, conv1_key, conv2_key, dtype=dtype)

    total = t_enc + t_ctx + t_corr + t_fus + t_cve + t_dec
    print(f"stage sum              {total:8.2f} ms (full fwd {t_full:.2f})")


if __name__ == "__main__":
    main()
