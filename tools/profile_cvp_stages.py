"""Stage-level timing of the cvp_mvsnet forward on TPU at bench shapes.

Locates where the ~93 ms/frame at 256x320 goes: feature pyramid, coarse
sweep volume, per-level hypothesis solve / warp volume / 3D regularizer.
Run from the repo root: `BENCH_DTYPE=bfloat16 python tools/profile_cvp_stages.py`.
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
from robustmvd_tpu.models.blocks.cvp_mvsnet import (
    CostRegNet,
    FeaturePyramid,
    cal_depth_hypos,
    cal_sweeping_depth_hypos,
    condition_intrinsics,
    proj_cost_volume,
)
from robustmvd_tpu.ops.homography import rt_planesweep_warp
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
    """Jit a stage so the timed program returns ONE scalar: the fetched
    leaf must be tiny (force_fetch host-copies it through the tunnel), and
    the abs-sum keeps every output contributing so nothing is DCE'd."""

    @jax.jit
    def g(*args):
        out = fn(*args)
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)

    return g


def main():
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    nscale = 5
    model = create_model(
        "cvp_mvsnet", pretrained=False, weights=None, nscale=nscale, dtype=dtype
    )
    variables = model.variables
    mod = model.module
    p = variables["params"]

    B, V, H, W = 1, 3, 256, 320
    nsrc = V - 1
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
    min_depth = jnp.full((B,), 0.5)
    max_depth = jnp.full((B,), 10.0)

    @jax.jit
    def full(variables, images):
        pred, aux = mod.apply(
            variables, images, poses, intrinsics, keyview_idx, min_depth, max_depth
        )
        return pred["depth"]

    t_full = timeit(full, variables, images)
    print(f"full forward                 {t_full:8.2f} ms")

    cdt = jnp.bfloat16 if dtype in ("bfloat16", "bf16") else jnp.float32
    pyr = FeaturePyramid(dtype=cdt, name="featurePyramid")
    reg = CostRegNet(dtype=cdt, name="cost_reg_refine")
    p_pyr = {"params": p["featurePyramid"]}
    p_reg = {"params": p["cost_reg_refine"]}
    if "batch_stats" in variables:
        bs = variables["batch_stats"]
        if "featurePyramid" in bs:
            p_pyr["batch_stats"] = bs["featurePyramid"]
        if "cost_reg_refine" in bs:
            p_reg["batch_stats"] = bs["cost_reg_refine"]

    image_key = images[:, 0]
    images_src = images[:, 1:]

    def stage_pyramid(images):
        outs = []
        for v in range(V):
            outs.append(pyr.apply(p_pyr, images[:, v], nscale))
        return outs

    fps = jax.jit(stage_pyramid)(images)
    t_pyr = timeit(scalarize(stage_pyramid), images)
    print(f"feature pyramid ({V}v x {nscale}s)     {t_pyr:8.2f} ms")

    ref_fp = fps[0]
    src_fps = [fps[1 + i] for i in range(nsrc)]
    fp_shapes = [(f.shape[1], f.shape[2]) for f in ref_fp]
    K_key = intrinsics[:, 0]
    K_srcs = intrinsics[:, 1:]
    pose_key = poses[:, 0]
    poses_src = poses[:, 1:]
    ref_K_ms = condition_intrinsics(K_key, (H, W), fp_shapes)
    src_K_ms = jnp.stack(
        [condition_intrinsics(K_srcs[:, i], (H, W), fp_shapes) for i in range(nsrc)],
        axis=1,
    )

    # ---- coarse level ---------------------------------------------------
    depth_hypos = cal_sweeping_depth_hypos(min_depth, max_depth, 48)

    def proj_mat(Km, ex):
        top = jnp.einsum("bij,bjk->bik", Km, ex[:, :3, :])
        bottom = jnp.broadcast_to(
            jnp.asarray([0, 0, 0, 1], jnp.float32).reshape(1, 1, 4), (B, 1, 4)
        )
        return jnp.concatenate([top, bottom], axis=1)

    use_fused = os.environ.get("BENCH_WARP_IMPL", "pallas") == "pallas"

    def stage_coarse_volume(ref_fp_last, src_fp_lasts):
        ref_proj_inv = jnp.linalg.inv(proj_mat(ref_K_ms[:, -1], pose_key))
        if use_fused:
            from robustmvd_tpu.ops.pallas.sweep_warp import warp_variance_rt

            projs = jnp.stack(
                [
                    proj_mat(src_K_ms[:, i, -1], poses_src[:, i]) @ ref_proj_inv
                    for i in range(nsrc)
                ],
                axis=1,
            )
            return warp_variance_rt(
                ref_fp_last,
                jnp.stack(src_fp_lasts, axis=1),
                projs[:, :, :3, :3],
                projs[:, :, :3, 3],
                depth_hypos,
                dc=16,
                band=4,
            )
        ref_volume = jnp.broadcast_to(
            ref_fp_last[:, None], (B, 48, *ref_fp_last.shape[1:])
        )
        volume_sum = ref_volume.astype(jnp.float32)
        volume_sq_sum = volume_sum**2
        for i in range(nsrc):
            proj = proj_mat(src_K_ms[:, i, -1], poses_src[:, i]) @ ref_proj_inv
            warped = rt_planesweep_warp(
                src_fp_lasts[i], proj[:, :3, :3], proj[:, :3, 3], depth_hypos
            ).astype(jnp.float32)
            volume_sum = volume_sum + warped
            volume_sq_sum = volume_sq_sum + warped**2
        return volume_sq_sum / 3.0 - (volume_sum / 3.0) ** 2

    cv0 = jax.jit(stage_coarse_volume)(ref_fp[-1], [f[-1] for f in src_fps])
    t_cv0 = timeit(scalarize(stage_coarse_volume), ref_fp[-1], [f[-1] for f in src_fps])
    print(f"coarse volume (48x{fp_shapes[-1][0]}x{fp_shapes[-1][1]})    {t_cv0:8.2f} ms")

    def stage_reg(cv):
        return reg.apply(p_reg, cv, train=False)

    logits = jax.jit(stage_reg)(cv0)
    t_reg0 = timeit(scalarize(stage_reg), cv0)
    print(f"cost_reg coarse              {t_reg0:8.2f} ms")

    prob = jax.nn.softmax(logits, axis=1)
    depth = jnp.sum(prob * depth_hypos[:, :, None, None], axis=1)

    total_refine = 0.0
    for level in range(nscale - 2, -1, -1):
        h, w = fp_shapes[level]

        def stage_up_hypo(depth):
            depth_up = jax.image.resize(
                depth, (B, depth.shape[1] * 2, depth.shape[2] * 2), method="bicubic"
            )
            return (
                cal_depth_hypos(
                    depth_up,
                    ref_K_ms[:, level],
                    src_K_ms[:, 0, level],
                    pose_key,
                    poses_src[:, 0],
                    mode="test",
                ),
                depth_up,
            )

        hypos, depth_up = jax.jit(stage_up_hypo)(depth)
        t_hypo = timeit(scalarize(stage_up_hypo), depth)

        def stage_volume(ref_f, src_f, hypos):
            return proj_cost_volume(
                ref_f,
                [src_f[i] for i in range(nsrc)],
                ref_K_ms[:, level],
                src_K_ms[:, :, level],
                pose_key,
                poses_src,
                hypos,
                impl="pallas_fused" if use_fused else "xla",
            )

        src_f = [src_fps[i][level] for i in range(nsrc)]
        cv = jax.jit(stage_volume)(ref_fp[level], src_f, hypos)
        t_vol = timeit(scalarize(stage_volume), ref_fp[level], src_f, hypos)

        def stage_reg_l(cv):
            return reg.apply(p_reg, cv, train=False)

        logits = jax.jit(stage_reg_l)(cv)
        t_regl = timeit(scalarize(stage_reg_l), cv)

        def stage_sm(logits, hypos):
            prob = jax.nn.softmax(logits, axis=1)
            return jnp.sum(prob * hypos, axis=1)

        depth = jax.jit(stage_sm)(logits, hypos)
        t_sm = timeit(scalarize(stage_sm), logits, hypos)

        lvl_total = t_hypo + t_vol + t_regl + t_sm
        total_refine += lvl_total
        print(
            f"level {level} ({h:3d}x{w:3d}): hypo {t_hypo:6.2f}  vol {t_vol:6.2f}"
            f"  reg {t_regl:6.2f}  sm {t_sm:6.2f}  | {lvl_total:7.2f} ms"
        )

    total = t_pyr + t_cv0 + t_reg0 + total_refine
    print(f"stage sum                    {total:8.2f} ms (full fwd {t_full:.2f})")


if __name__ == "__main__":
    main()
