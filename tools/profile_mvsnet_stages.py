"""Stage-level timing of the mvsnet_train forward on TPU at bench shapes.

Stages: FeatureNet (3 views), warp+variance volume (D=256), CostRegNet,
softmax/depth-regression/confidence. Timed programs return one scalar so
the tunnel fetch does not pollute per-stage numbers.
Run: `BENCH_DTYPE=bfloat16 python tools/profile_mvsnet_stages.py`.
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
from robustmvd_tpu.models.blocks.mvsnet import CostRegNet, FeatureNet
from robustmvd_tpu.ops.homography import homo_warp
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
    return (time.perf_counter() - start) / iters * 1e3  # ms


def scalarize(fn):
    @jax.jit
    def g(*args):
        out = fn(*args)
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)

    return g


def main():
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    D = 256
    model = create_model(
        "mvsnet_train", pretrained=False, weights=None, dtype=dtype,
        num_sampling_steps=D,
    )
    variables = model.variables
    mod = model.module
    p = variables["params"]

    B, V, H, W = 1, 3, 256, 320
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    poses_np = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for i in range(1, V):
        poses_np[:, i, 0, 3] = 0.1 * i
        poses_np[:, i, 1, 3] = 0.05 * i
    K = np.array(
        [[W * 0.8, 0, W / 2], [0, W * 0.8, H / 2], [0, 0, 1]], dtype=np.float32
    )
    intrinsics = jnp.asarray(np.tile(K, (B, V, 1, 1)))
    poses = jnp.asarray(poses_np)
    keyview_idx = jnp.zeros((B,), jnp.int32)
    depth_range = (jnp.full((B,), 0.5), jnp.full((B,), 10.0))

    @jax.jit
    def full(variables, images):
        pred, aux = mod.apply(
            variables, images, poses, intrinsics, keyview_idx, depth_range
        )
        return pred["depth"]

    t_full = timeit(full, variables, images)
    print(f"full forward                 {t_full:8.2f} ms")

    cdt = jnp.bfloat16 if dtype in ("bfloat16", "bf16") else jnp.float32
    feat = FeatureNet(dtype=cdt, name="feature")
    reg = CostRegNet(dtype=cdt, conv3d_impl=mod.conv3d_impl, name="cost_regularization")
    p_feat = {"params": p["feature"]}
    p_reg = {"params": p["cost_regularization"]}
    if "batch_stats" in variables:
        bs = variables["batch_stats"]
        if "feature" in bs:
            p_feat["batch_stats"] = bs["feature"]
        if "cost_regularization" in bs:
            p_reg["batch_stats"] = bs["cost_regularization"]

    # projection matrices as the model builds them
    scale = jnp.asarray([[0.25] * 3, [0.25] * 3, [1.0] * 3], jnp.float32)
    top = jnp.einsum("bvij,bvjk->bvik", intrinsics * scale, poses[:, :, :3, :4])
    bottom = jnp.broadcast_to(
        jnp.asarray([0, 0, 0, 1], jnp.float32).reshape(1, 1, 1, 4), (B, V, 1, 4)
    )
    proj = jnp.concatenate([top, bottom], axis=2)
    proj_key = jnp.linalg.inv(proj[:, 0])
    proj_src = proj[:, 1:]
    depth_samples = jnp.broadcast_to(
        jnp.linspace(0.5, 10.0, D, dtype=jnp.float32)[None], (B, D)
    )

    def stage_feature(images):
        f = feat.apply(p_feat, images.reshape(B * V, H, W, 3).astype(cdt), train=False)
        return f.reshape(B, V, *f.shape[1:])

    feats = jax.jit(stage_feature)(images)
    t_feat = timeit(scalarize(stage_feature), images)
    print(f"FeatureNet ({V} views)         {t_feat:8.2f} ms")

    ref_feats = feats[:, 0]
    src_feats = feats[:, 1:]
    h, w, F = ref_feats.shape[1:]

    use_fused = os.environ.get("BENCH_WARP_IMPL", "pallas") == "pallas"

    def stage_variance(ref_feats, src_feats):
        if use_fused:
            from robustmvd_tpu.ops.pallas.sweep_warp import warp_variance

            return warp_variance(
                ref_feats, src_feats, proj_src, proj_key, depth_samples,
                out_dtype=cdt,
            )
        ref_volume = jnp.broadcast_to(ref_feats[:, None], (B, D, h, w, F))
        volume_sum = ref_volume.astype(jnp.float32)
        volume_sq_sum = volume_sum**2

        def add_view(carry, view):
            vsum, vsq = carry
            src_feat, src_proj = view
            warped = homo_warp(src_feat, src_proj, proj_key, depth_samples)
            warped = warped.astype(jnp.float32)
            return (vsum + warped, vsq + warped**2), None

        (volume_sum, volume_sq_sum), _ = jax.lax.scan(
            add_view,
            (volume_sum, volume_sq_sum),
            (jnp.moveaxis(src_feats, 1, 0), jnp.moveaxis(proj_src, 1, 0)),
        )
        return volume_sq_sum / 3.0 - (volume_sum / 3.0) ** 2

    cv = jax.jit(stage_variance)(ref_feats, src_feats)
    t_var = timeit(scalarize(stage_variance), ref_feats, src_feats)
    print(f"warp+variance (D={D})        {t_var:8.2f} ms")

    def stage_reg(cv):
        return reg.apply(p_reg, cv.astype(cdt), train=False)[..., 0]

    logits = jax.jit(stage_reg)(cv)
    t_reg = timeit(scalarize(stage_reg), cv)
    print(f"CostRegNet                   {t_reg:8.2f} ms")

    def stage_head(logits):
        prob_volume = jax.nn.softmax(logits, axis=1)
        depth = jnp.sum(prob_volume * depth_samples[:, :, None, None], axis=1)
        padded = jnp.pad(prob_volume, ((0, 0), (1, 2), (0, 0), (0, 0)))
        prob_sum4 = (
            padded[:, 0:D]
            + padded[:, 1 : D + 1]
            + padded[:, 2 : D + 2]
            + padded[:, 3 : D + 3]
        )
        d_index = jnp.sum(
            prob_volume * jnp.arange(D, dtype=jnp.float32)[None, :, None, None], axis=1
        ).astype(jnp.int32)
        confidence = jnp.take_along_axis(prob_sum4, d_index[:, None], axis=1)[:, 0]
        return depth, confidence

    t_head = timeit(scalarize(stage_head), logits)
    print(f"softmax/regression/conf      {t_head:8.2f} ms")

    total = t_feat + t_var + t_reg + t_head
    print(f"stage sum                    {total:8.2f} ms (full fwd {t_full:.2f})")


if __name__ == "__main__":
    main()
