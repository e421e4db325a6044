"""CVP-MVSNet — coarse-to-fine cost-volume pyramid MVS, TPU-native.

Reference parity (rmvd/models/cvp_mvsnet.py:60-321): feature pyramid over
nscale=5 image scales; coarsest-level sweep with 48 uniform hypotheses +
variance cost volume + shared 3D CostRegNet; then per-level bicubic x2
upsampling + epipolar local-refinement hypotheses + proj_cost + the same
CostRegNet + refined depth regression; confidence = 4-tap prob mass at the
argmax index (:219-236); inputs /255 at a multiple of 64 (:259-288).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.homography import rt_planesweep_warp
from ..parallel.context import constrain
from ..utils.image import resize_bilinear as np_resize_bilinear
from .blocks.cvp_mvsnet import (
    CostRegNet,
    FeaturePyramid,
    cal_depth_hypos,
    cal_sweeping_depth_hypos,
    condition_intrinsics,
    proj_cost_volume,
)
from .helpers import ModelBase
from .registry import register_model
from .robust_mvd import split_key_sources


def _resize_bicubic_x2(depth):
    """(B, H, W) -> (B, 2H, 2W) bicubic (reference: cvp_mvsnet.py:172-180)."""
    B, H, W = depth.shape
    return jax.image.resize(depth, (B, 2 * H, 2 * W), method="bicubic")


class CVPMVSNetModule(nn.Module):
    nscale: int = 5
    mode: str = "test"
    # compute dtype ("float32" | "bfloat16"): bf16 runs the feature
    # pyramid, warps and 3D regularizer on the MXU's native path; geometry
    # (hypothesis solve), variance accumulation, softmax/depth regression
    # and confidence stay fp32 (the robust_mvd mixed-precision template).
    dtype: str = "float32"
    # 3x3x3 stride-1 conv lowering in CostRegNet: "xla" or lane-packed
    # "banded"/"packed" (ops/conv3d.py) — same parameters either way
    conv3d_impl: str = "xla"
    # warp+variance stage: "auto" picks the fused banded-MXU Pallas kernel
    # (ops/pallas/sweep_warp.py) on TPU — zero gathers, no per-view warped
    # volumes in HBM; "xla" forces the rt_planesweep_warp loops
    warp_impl: str = "auto"

    def _use_fused_warp(self):
        if self.warp_impl == "xla":
            return False
        if self.warp_impl in ("pallas_fused", "pallas"):
            return True
        default_dev = jax.config.jax_default_device
        platform = (
            default_dev.platform if default_dev is not None else jax.default_backend()
        )
        return platform == "tpu"

    @nn.compact
    def __call__(self, images, poses, intrinsics, keyview_idx, min_depth, max_depth, num_views=None):
        """images: (B, V, H, W, 3) in [0, 1]; intrinsics ABSOLUTE (B, V, 3, 3)."""
        B, V, H, W, _ = images.shape
        nsrc = V - 1
        dtype = images.dtype

        if num_views is not None:
            src_valid = (
                jnp.arange(V - 1)[None, :] < (num_views.reshape(-1, 1) - 1)
            ).astype(dtype)  # (B, V-1)
        else:
            src_valid = jnp.ones((B, V - 1), dtype)

        image_key, images_src = split_key_sources(images, keyview_idx)
        K_key, K_srcs = split_key_sources(intrinsics, keyview_idx)
        pose_key, poses_src = split_key_sources(poses, keyview_idx)

        cdt = jnp.bfloat16 if self.dtype in ("bfloat16", "bf16") else jnp.float32
        pyramid = FeaturePyramid(dtype=cdt, name="featurePyramid")
        # batch ALL views through the pyramid in one pass: each of the
        # 9-conv x 5-scale pyramid's layers is dispatch-floor bound at
        # these sizes, so V-fold batching removes (V-1)/V of the overhead
        all_imgs = jnp.concatenate(
            [image_key[:, None]]
            + [images_src[:, i : i + 1] for i in range(nsrc)],
            axis=1,
        )  # (B, V, H, W, 3) key-first
        fp_all = pyramid(all_imgs.reshape(B * V, H, W, 3), self.nscale)
        ref_fp = [f.reshape(B, V, *f.shape[1:])[:, 0] for f in fp_all]
        src_fps = [
            [f.reshape(B, V, *f.shape[1:])[:, 1 + i] for f in fp_all]
            for i in range(nsrc)
        ]

        fp_shapes = [(f.shape[1], f.shape[2]) for f in ref_fp]
        ref_K_ms = condition_intrinsics(K_key, (H, W), fp_shapes)  # (B, S, 3, 3)
        src_K_ms = jnp.stack(
            [condition_intrinsics(K_srcs[:, i], (H, W), fp_shapes) for i in range(nsrc)],
            axis=1,
        )  # (B, nsrc, S, 3, 3)

        cost_reg = CostRegNet(dtype=cdt, conv3d_impl=self.conv3d_impl, name="cost_reg_refine")

        # ---- coarsest level: uniform sweep + variance volume --------------
        depth_hypos = cal_sweeping_depth_hypos(min_depth, max_depth, 48)  # (B, 48)
        D0 = depth_hypos.shape[1]

        ref_feat = ref_fp[-1]
        h0, w0 = ref_feat.shape[1], ref_feat.shape[2]
        use_fused = self._use_fused_warp()

        def proj_mat(K, ex):
            # VPU contraction: an einsum would round the projection entries
            # to bf16 on the MXU (~0.03 px sampling error, ops/homography.py)
            top = jnp.sum(K[:, :, :, None] * ex[:, None, :3, :], axis=2)
            bottom = jnp.broadcast_to(
                jnp.asarray([0, 0, 0, 1], dtype).reshape(1, 1, 4), (B, 1, 4)
            )
            return jnp.concatenate([top, bottom], axis=1)

        def src_from_ref(K_src, pose_src, ref_proj_inv):
            p = proj_mat(K_src, pose_src)
            return jnp.sum(
                p[:, :, :, None] * ref_proj_inv[:, None, :, :], axis=2
            )

        ref_proj_inv = jnp.linalg.inv(proj_mat(ref_K_ms[:, -1], pose_key))
        if use_fused:
            from ..ops.pallas.sweep_warp import warp_variance_rt

            projs = jnp.stack(
                [
                    src_from_ref(src_K_ms[:, i, -1], poses_src[:, i], ref_proj_inv)
                    for i in range(nsrc)
                ],
                axis=1,
            )  # (B, nsrc, 4, 4)
            cost_volume = warp_variance_rt(
                ref_feat,
                jnp.stack([src_fps[i][-1] for i in range(nsrc)], axis=1),
                projs[:, :, :3, :3],
                projs[:, :, :3, 3],
                depth_hypos,
                src_valid=src_valid,
                out_dtype=cdt,
                dc=min(16, D0),
                band=4,
            )
        else:
            ref_volume = jnp.broadcast_to(
                ref_feat[:, None], (B, D0, h0, w0, ref_feat.shape[-1])
            )
            # fp32 variance accumulation (E[x^2]-E[x]^2 cancels
            # catastrophically in bf16)
            volume_sum = ref_volume.astype(jnp.float32)
            volume_sq_sum = volume_sum**2
            for i in range(nsrc):
                proj = src_from_ref(src_K_ms[:, i, -1], poses_src[:, i], ref_proj_inv)
                warped = rt_planesweep_warp(
                    src_fps[i][-1], proj[:, :3, :3], proj[:, :3, 3], depth_hypos
                )
                # barrier: keep XLA from duplicating the warp gather into
                # both the sum and square consumers (see blocks/cvp_mvsnet.py)
                warped = jax.lax.optimization_barrier(warped)
                warped = warped.astype(jnp.float32) * src_valid[:, i].reshape(B, 1, 1, 1, 1)
                volume_sum = volume_sum + warped
                volume_sq_sum = volume_sq_sum + warped**2
            count0 = (1.0 + jnp.sum(src_valid, axis=1)).reshape(B, 1, 1, 1, 1)
            cost_volume = volume_sq_sum / count0 - (volume_sum / count0) ** 2
        # depth-hypothesis slabs shard over the "hyp" mesh axis; the 3D
        # regularizer partitions over D with halo exchanges and the softmax
        # over D lowers to a global max+sum psum (SURVEY §2.10)
        cost_volume = constrain(cost_volume, "data", "hyp")

        logits = cost_reg(cost_volume, train=False)  # (B, D, h, w)
        logits = constrain(logits, "data", "hyp")
        prob_volume = jax.nn.softmax(logits, axis=1)
        depth = jnp.sum(prob_volume * depth_hypos[:, :, None, None], axis=1)  # (B,h,w)
        depth_est_list = [depth]

        # ---- refinement levels -------------------------------------------
        for level in range(self.nscale - 2, -1, -1):
            depth_up = _resize_bicubic_x2(depth)
            hypos = cal_depth_hypos(
                depth_up,
                ref_K_ms[:, level],
                src_K_ms[:, 0, level],
                pose_key,
                poses_src[:, 0],
                mode=self.mode,
            )  # (B, 2d, h, w)
            cost_volume = proj_cost_volume(
                ref_fp[level],
                [src_fps[i][level] for i in range(nsrc)],
                ref_K_ms[:, level],
                src_K_ms[:, :, level],
                pose_key,
                poses_src,
                hypos,
                src_valid=src_valid,
                impl="pallas_fused" if use_fused else "xla",
                out_dtype=cdt,
            )
            cost_volume = constrain(cost_volume, "data", "hyp")
            logits = cost_reg(cost_volume, train=False)
            logits = constrain(logits, "data", "hyp")
            prob_volume = jax.nn.softmax(logits, axis=1)
            depth = jnp.sum(prob_volume * hypos, axis=1)
            depth_est_list.append(depth)

        # ---- confidence (reference: :219-236) ----------------------------
        Dp = prob_volume.shape[1]
        padded = jnp.pad(prob_volume, ((0, 0), (1, 2), (0, 0), (0, 0)))
        prob_sum4 = (
            padded[:, 0:Dp] + padded[:, 1 : Dp + 1] + padded[:, 2 : Dp + 2] + padded[:, 3 : Dp + 3]
        )
        d_index = jnp.sum(
            prob_volume * jnp.arange(Dp, dtype=dtype)[None, :, None, None], axis=1
        ).astype(jnp.int32)
        confidence = jnp.take_along_axis(prob_sum4, d_index[:, None], axis=1)[:, 0]

        pred_depth = depth_est_list[-1]
        pred = {
            "depth": pred_depth[..., None],  # (B, H, W, 1)
            "depth_uncertainty": (1.0 - confidence)[..., None],
        }
        aux = {"depth": pred["depth"], "depths_all": [d[..., None] for d in depth_est_list[::-1]]}
        return pred, aux


class CVPMVSNet(ModelBase):
    def __init__(self, nscale=5, weights=None, train=False, seed=0, dtype="float32", conv3d_impl="xla", warp_impl="auto", **_):
        if train:
            # the fused warp kernel is forward-only (no VJP yet)
            warp_impl = "xla"
        module = CVPMVSNetModule(nscale=nscale, mode="train" if train else "test", dtype=dtype, conv3d_impl=conv3d_impl, warp_impl=warp_impl)
        rng = jax.random.PRNGKey(seed)
        dummy = {
            "images": jnp.zeros((1, 3, 64, 64, 3)),
            "poses": jnp.tile(jnp.eye(4), (1, 3, 1, 1)),
            "intrinsics": jnp.tile(jnp.eye(3) * 32, (1, 3, 1, 1)),
            "keyview_idx": jnp.zeros((1,), jnp.int32),
            "min_depth": jnp.ones((1,)),
            "max_depth": jnp.full((1,), 10.0),
        }
        variables = module.init(rng, **dummy)
        if weights is not None:
            from .weights import convert_torch_checkpoint

            variables = convert_torch_checkpoint(weights)
        super().__init__(module, variables, train=train)

    def apply_fn(self, variables, images, poses, intrinsics, keyview_idx, min_depth=None, max_depth=None, num_views=None, **_):
        if min_depth is None:
            B = images.shape[0]
            min_depth = jnp.full((B,), 0.2)
            max_depth = jnp.full((B,), 100.0)
        return self.module.apply(
            variables, images, poses, intrinsics, keyview_idx, min_depth, max_depth, num_views
        )

    def input_adapter(self, images, keyview_idx, poses=None, intrinsics=None, depth_range=None):
        """Multiple-of-64 resize + /255 normalization

        (reference: cvp_mvsnet.py:259-288)."""
        orig_ht, orig_wd = images[0].shape[-2:]
        ht = int(math.ceil(orig_ht / 64.0) * 64.0)
        wd = int(math.ceil(orig_wd / 64.0) * 64.0)
        if (orig_ht, orig_wd) != (ht, wd):
            sx, sy = wd / orig_wd, ht / orig_ht
            images = [np_resize_bilinear(img, (ht, wd)) for img in images]
            intrinsics = [
                K * np.array([[sx, 1, sx], [1, sy, sy], [1, 1, 1]], dtype=np.float32)
                for K in intrinsics
            ]

        images = [img / 255.0 for img in images]
        if depth_range is None:
            depth_range = (np.array([0.2]), np.array([100.0]))
        lo, hi = depth_range

        # bucket the view list (see robust_mvd.input_adapter)
        num_total = len(images)
        num_sources = num_total - 1
        bucket = 1 if num_sources <= 1 else 2 ** int(np.ceil(np.log2(num_sources)))
        images = list(images); poses = list(poses); intrinsics = list(intrinsics)
        while len(images) < 1 + bucket:
            images.append(images[-1])
            poses.append(poses[-1])
            intrinsics.append(intrinsics[-1])

        images_nhwc = np.stack(images, axis=1).transpose(0, 1, 3, 4, 2).astype(np.float32)
        return {
            "images": jnp.asarray(images_nhwc),
            "poses": jnp.asarray(np.stack(poses, axis=1).astype(np.float32)),
            "intrinsics": jnp.asarray(np.stack(intrinsics, axis=1).astype(np.float32)),
            "keyview_idx": jnp.asarray(np.asarray(keyview_idx).reshape(-1), jnp.int32),
            "min_depth": jnp.asarray(np.asarray(lo).reshape(-1), jnp.float32),
            "max_depth": jnp.asarray(np.asarray(hi).reshape(-1), jnp.float32),
            "num_views": jnp.full((images_nhwc.shape[0],), num_total, dtype=jnp.int32),
        }

    def output_adapter(self, model_output):
        pred, aux = model_output

        def to_chw(x):
            if hasattr(x, "ndim") and x.ndim == 4:
                return np.asarray(x).transpose(0, 3, 1, 2)
            return np.asarray(x) if hasattr(x, "shape") else x

        from .helpers import LazyNumpyDict

        pred = {k: to_chw(v) for k, v in pred.items()}
        return pred, LazyNumpyDict(aux, to_chw)


@register_model(trainable=False)
def cvp_mvsnet(pretrained=True, weights=None, train=False, **kwargs):
    """(reference: cvp_mvsnet.py:308-321 — no pretrained weights available)"""
    kwargs.pop("num_sampling_steps", None)
    return CVPMVSNet(weights=weights, train=train, **kwargs)
