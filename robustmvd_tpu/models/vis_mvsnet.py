"""Vis-MVSNet — 3-stage cascaded MVS with visibility-aware fusion, TPU-native.

Reference parity (rmvd/models/vis_mvsnet.py:25-242): shared FeatExt, three
SingleStages with depth_nums [64, 32, 16] and interval scales [4, 2, 1];
stage k+1 depth_start comes from the upsampled stage-k estimate minus half
the stage's depth span (:117-156); cam tensors (B, 2, 4, 4) embed pose, K
and depth_start/interval/steps/max (:50-62); uncertainty = 1 - prob_map
(:180-182); ImageNet-normalized BGR inputs at a multiple of 64 (:189-226).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interpolate import resize_bilinear
from ..utils.image import resize_bilinear as np_resize_bilinear
from .blocks.vis_mvsnet import FeatExt, SingleStage
from .helpers import ModelBase
from .registry import register_model
from .robust_mvd import split_key_sources


def _resize_map(x, size):
    """Bilinear resize of a (B, 1, h, w) map."""
    x = jnp.transpose(x, (0, 2, 3, 1))
    x = resize_bilinear(x, size)
    return jnp.transpose(x, (0, 3, 1, 2))


class VisMvsnetModule(nn.Module):
    num_sampling_steps: int = 192
    mode: str = "soft"
    train_bn: bool = False
    # compute dtype ("float32" | "bfloat16"): bf16 runs FeatExt and the
    # per-stage 3D regularizers/cost volumes on the MXU's native path;
    # cam/homography math, score volumes, soft-argmin and fusion weights
    # stay fp32 (the robust_mvd mixed-precision template).
    dtype: str = "float32"
    # 3x3x3 stride-1 conv lowering in the 3D regularizers: "xla" or the
    # lane-packed "banded"/"packed" (ops/conv3d.py) — same parameters
    conv3d_impl: str = "banded"
    # per-pair warp+groupwise-correlation: "auto" fuses into the banded-MXU
    # Pallas kernel on TPU (forward-only; training forces "xla")
    warp_impl: str = "auto"

    @nn.compact
    def __call__(self, images, poses, intrinsics, keyview_idx, depth_range, num_views=None):
        """images: (B, V, H, W, 3) normalized BGR; intrinsics ABSOLUTE

        (B, V, 3, 3); depth_range: (min (B,), max (B,))."""
        B, V, H, W, _ = images.shape
        dtype = images.dtype

        min_depth, max_depth = depth_range
        min_depth = jnp.asarray(min_depth, dtype).reshape(B)
        max_depth = jnp.asarray(max_depth, dtype).reshape(B)
        step_size = (max_depth - min_depth) / self.num_sampling_steps

        # cam tensors (reference: vis_mvsnet.py:50-62)
        cams = jnp.zeros((B, V, 2, 4, 4), dtype)
        cams = cams.at[:, :, 0].set(poses)
        cams = cams.at[:, :, 1, :3, :3].set(intrinsics)
        cams = cams.at[:, :, 1, 3, 0].set(min_depth[:, None])
        cams = cams.at[:, :, 1, 3, 1].set(step_size[:, None])
        cams = cams.at[:, :, 1, 3, 2].set(float(self.num_sampling_steps))
        cams = cams.at[:, :, 1, 3, 3].set(max_depth[:, None])

        image_key, images_src = split_key_sources(images, keyview_idx)
        cam_key, cams_src = split_key_sources(cams, keyview_idx)

        depth_start = cam_key[:, 1:2, 3:4, 0:1]  # (B, 1, 1, 1)
        depth_interval = cam_key[:, 1:2, 3:4, 1:2]

        depth_nums = [64, 32, 16]
        interval_scales = [4.0, 2.0, 1.0]

        # shared feature extraction over all views at once
        cdt = jnp.bfloat16 if self.dtype in ("bfloat16", "bf16") else jnp.float32
        feat1, feat2, feat3 = FeatExt(dtype=cdt, name="feat_ext")(
            images.reshape(B * V, H, W, 3), train=self.train_bn
        )

        def unpack(feat):
            f = feat.reshape(B, V, *feat.shape[1:])
            ref, srcs = split_key_sources(f, keyview_idx)
            return ref, [srcs[:, i] for i in range(V - 1)]

        ref1, srcs1 = unpack(feat1)
        ref2, srcs2 = unpack(feat2)
        ref3, srcs3 = unpack(feat3)
        srcs_cam = [cams_src[:, i] for i in range(V - 1)]

        if num_views is not None:
            src_valid = [
                (jnp.asarray(i) < (num_views.reshape(-1) - 1)).astype(dtype)
                for i in range(V - 1)
            ]
        else:
            src_valid = None

        est_depth_1, prob_map_1, pair_results_1 = SingleStage(dtype=cdt, conv3d_impl=self.conv3d_impl, warp_impl=self.warp_impl, name="stage1")(
            ref1, cam_key, srcs1, srcs_cam,
            depth_num=depth_nums[0],
            mode=self.mode,
            depth_start_override=None,
            depth_interval_override=depth_interval * interval_scales[0],
            s_scale=8,
            src_valid=src_valid,
            train=self.train_bn,
        )
        prob_map_1_up = _resize_map(prob_map_1, (prob_map_1.shape[2] * 4, prob_map_1.shape[3] * 4))

        size2 = (ref2.shape[1], ref2.shape[2])
        depth_start_2 = (
            _resize_map(jax.lax.stop_gradient(est_depth_1), size2)
            - depth_nums[1] * depth_interval * interval_scales[1] / 2
        )
        est_depth_2, prob_map_2, pair_results_2 = SingleStage(dtype=cdt, conv3d_impl=self.conv3d_impl, warp_impl=self.warp_impl, name="stage2")(
            ref2, cam_key, srcs2, srcs_cam,
            depth_num=depth_nums[1],
            mode=self.mode,
            depth_start_override=depth_start_2,
            depth_interval_override=depth_interval * interval_scales[1],
            s_scale=4,
            src_valid=src_valid,
            train=self.train_bn,
        )
        prob_map_2_up = _resize_map(prob_map_2, (prob_map_2.shape[2] * 2, prob_map_2.shape[3] * 2))

        size3 = (ref3.shape[1], ref3.shape[2])
        depth_start_3 = (
            _resize_map(jax.lax.stop_gradient(est_depth_2), size3)
            - depth_nums[2] * depth_interval * interval_scales[2] / 2
        )
        est_depth_3, prob_map_3, pair_results_3 = SingleStage(dtype=cdt, conv3d_impl=self.conv3d_impl, warp_impl=self.warp_impl, name="stage3")(
            ref3, cam_key, srcs3, srcs_cam,
            depth_num=depth_nums[2],
            mode=self.mode,
            depth_start_override=depth_start_3,
            depth_interval_override=depth_interval * interval_scales[2],
            s_scale=2,
            src_valid=src_valid,
            train=self.train_bn,
        )

        pred_depth = est_depth_3  # (B, 1, h, w)
        pred_uncertainty = 1.0 - prob_map_3

        # channel-last output contract
        pred = {
            "depth": jnp.transpose(pred_depth, (0, 2, 3, 1)),
            "depth_uncertainty": jnp.transpose(pred_uncertainty, (0, 2, 3, 1)),
        }
        aux = {
            "outputs": [
                [est_depth_1, pair_results_1],
                [est_depth_2, pair_results_2],
                [est_depth_3, pair_results_3],
            ],
            "prob_maps": [prob_map_1_up, prob_map_2_up, prob_map_3],
            "ref_cam": cam_key,
            "depth": pred["depth"],
        }
        return pred, aux


class VisMvsnet(ModelBase):
    def __init__(self, num_sampling_steps=192, weights=None, train=False, seed=0, dtype="float32", conv3d_impl="banded", bn_mode="batch", warp_impl="auto"):
        """bn_mode: "batch" updates BatchNorm running stats during training
        (the reference's model.train() semantics, rmvd/models/helpers.py:
        156-160 + vis_mvsnet_unet_modular.py BatchNorm2d/3d); "frozen"
        keeps running averages even in train mode."""
        train_bn = bool(train) and bn_mode == "batch"
        if train:
            # the fused warp kernel is forward-only (no VJP yet);
            # training differentiates through the warp, so keep the XLA path
            warp_impl = "xla"
        module = VisMvsnetModule(num_sampling_steps=num_sampling_steps, train_bn=train_bn, dtype=dtype, conv3d_impl=conv3d_impl, warp_impl=warp_impl)
        rng = jax.random.PRNGKey(seed)
        dummy = {
            "images": jnp.zeros((1, 2, 64, 64, 3)),
            "poses": jnp.tile(jnp.eye(4), (1, 2, 1, 1)),
            "intrinsics": jnp.tile(jnp.eye(3) * 32, (1, 2, 1, 1)),
            "keyview_idx": jnp.zeros((1,), jnp.int32),
            "depth_range": (jnp.ones((1,)), jnp.full((1,), 10.0)),
        }
        variables = module.init(rng, **dummy)
        if weights is not None:
            from .weights import convert_torch_checkpoint

            variables = convert_torch_checkpoint(weights)
        super().__init__(module, variables, train=train)
        # the trainer threads updated running stats through the step when
        # this is set (see train/multi_view_depth_training.py)
        self.has_mutable_bn = train_bn

    def apply_fn(self, variables, images, poses, intrinsics, keyview_idx, depth_range=None, num_views=None, **_):
        if depth_range is None:
            B = images.shape[0]
            depth_range = (jnp.full((B,), 0.2), jnp.full((B,), 100.0))
        if self.has_mutable_bn:
            out, _ = self.module.apply(
                variables, images, poses, intrinsics, keyview_idx, depth_range,
                num_views, mutable=["batch_stats"],
            )
            return out
        return self.module.apply(
            variables, images, poses, intrinsics, keyview_idx, depth_range, num_views
        )

    def apply_fn_mutable(self, variables, images, poses, intrinsics, keyview_idx, depth_range=None, num_views=None, **_):
        """Like apply_fn, but also returns the updated batch_stats
        collection (batch-stats BN training mode)."""
        if depth_range is None:
            B = images.shape[0]
            depth_range = (jnp.full((B,), 0.2), jnp.full((B,), 100.0))
        out, mutated = self.module.apply(
            variables, images, poses, intrinsics, keyview_idx, depth_range,
            num_views, mutable=["batch_stats"],
        )
        return out, mutated["batch_stats"]

    def input_adapter(self, images, keyview_idx, poses=None, intrinsics=None, depth_range=None):
        """Multiple-of-64 resize + ImageNet normalization + RGB->BGR flip

        (reference: vis_mvsnet.py:189-226)."""
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

        shift = np.array([0.485, 0.456, 0.406], np.float32)
        scale = np.array([0.229, 0.224, 0.225], np.float32)
        out_images = []
        for img in images:
            x = (img.astype(np.uint8).astype(np.float32) / 255.0 - shift[:, None, None]) / scale[:, None, None]
            x = x[:, ::-1]  # RGB -> BGR (reference: torch.flip(image, [0]))
            out_images.append(x)

        if depth_range is None:
            depth_range = (np.array([0.2]), np.array([100.0]))

        # bucket the view list (see robust_mvd.input_adapter)
        num_total = len(out_images)
        num_sources = num_total - 1
        bucket = 1 if num_sources <= 1 else 2 ** int(np.ceil(np.log2(num_sources)))
        poses = list(poses); intrinsics = list(intrinsics)
        while len(out_images) < 1 + bucket:
            out_images.append(out_images[-1])
            poses.append(poses[-1])
            intrinsics.append(intrinsics[-1])

        images_nhwc = np.stack(out_images, axis=1).transpose(0, 1, 3, 4, 2).astype(np.float32)
        lo, hi = depth_range
        return {
            "images": jnp.asarray(images_nhwc),
            "poses": jnp.asarray(np.stack(poses, axis=1).astype(np.float32)),
            "intrinsics": jnp.asarray(np.stack(intrinsics, axis=1).astype(np.float32)),
            "keyview_idx": jnp.asarray(np.asarray(keyview_idx).reshape(-1), jnp.int32),
            "depth_range": (
                jnp.asarray(np.asarray(lo).reshape(-1), jnp.float32),
                jnp.asarray(np.asarray(hi).reshape(-1), jnp.float32),
            ),
            "num_views": jnp.full((images_nhwc.shape[0],), num_total, dtype=jnp.int32),
        }

    def output_adapter(self, model_output):
        pred, aux = model_output

        def to_chw(x):
            if hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] == 1:
                return np.asarray(x).transpose(0, 3, 1, 2)
            return np.asarray(x) if hasattr(x, "shape") else x

        from .helpers import LazyNumpyDict

        def convert_nested(v):
            return jax.tree_util.tree_map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, v
            )

        pred = {k: to_chw(v) for k, v in pred.items()}
        return pred, LazyNumpyDict(aux, convert_nested)


@register_model
def vis_mvsnet(pretrained=True, weights=None, train=False, **kwargs):
    """(reference: vis_mvsnet.py:232-242 — pretrained from the Vis-MVSNet

    repo tar; local path required offline)."""
    cfg = {"num_sampling_steps": 192}
    cfg.update(kwargs)
    return VisMvsnet(weights=weights, train=train, **cfg)
