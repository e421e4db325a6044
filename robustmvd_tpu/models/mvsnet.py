"""MVSNet — fronto-parallel plane-sweep MVS, TPU-native.

Reference parity (rmvd/models/mvsnet.py:31-217): projection matrices are
K(scaled 1/4) @ pose with the key view's matrix inverted (:76-99);
FeatureNet features; variance aggregation ``E[x^2] - E[x]^2`` over views
(:124-137); CostRegNet 3D regularization; softmax + depth regression;
confidence = 4-tap sum of the probability volume gathered at the argmax
depth index (:143-160); 256 depth samples linear (or inverse) in the depth
range (:46-74); ImageNet-normalized inputs at a multiple of 32 (:170-199).

TPU-first: all views featurized in one conv pass; the per-view warped
volumes accumulate into running (sum, sum-of-squares) so only two volumes
are live (the psum-able form for sharding views across chips); channel-last
3D convs.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.homography import homo_warp
from ..ops.reductions import depth_regression
from ..parallel.context import constrain
from ..utils import to_numpy
from ..utils.image import resize_bilinear as np_resize_bilinear
from .blocks.mvsnet import CostRegNet, FeatureNet
from .helpers import ModelBase
from .registry import register_model
from .robust_mvd import split_key_sources


class MVSNetModule(nn.Module):
    sample_in_inv_depth_space: bool = False
    num_sampling_steps: int = 192
    train_bn: bool = False
    # view_parallel batches the per-view warps instead of scanning so the
    # masked variance sums become associative reductions GSPMD can psum
    # over the "view" mesh axis (SURVEY SS2.10 right column). Off-mesh the
    # scan is preferred: it keeps one live warped volume instead of V-1.
    view_parallel: bool = False
    # compute dtype ("float32" | "bfloat16"): bf16 runs FeatureNet, the
    # homography warps and the 3D CostRegNet on the MXU's native path;
    # projection/coordinate math, the variance accumulation (E[x^2]-E[x]^2
    # is cancellation-prone), BN statistics, the prob head and the
    # softmax/depth-regression stay fp32 — the robust_mvd mixed-precision
    # template (models/robust_mvd.py) applied to the family.
    dtype: str = "float32"
    # 3x3x3 stride-1 conv lowering inside CostRegNet: "xla" or the
    # lane-packed "banded"/"packed" (ops/conv3d.py) — same parameters
    conv3d_impl: str = "dz2d"
    # warp+variance stage: "auto" picks the fused banded-MXU Pallas kernel
    # (ops/pallas/sweep_warp.py) on TPU in the scan path — zero gathers,
    # no per-view warped volumes in HBM; "xla" forces the homo_warp scan
    # (always used under view_parallel, whose GSPMD sharding the Pallas
    # call would break, and on non-TPU backends)
    warp_impl: str = "auto"

    def _use_fused_warp(self):
        """Resolve warp_impl at trace time (static decision)."""
        if self.warp_impl == "xla":
            return False
        if self.warp_impl in ("pallas_fused", "pallas"):
            return True
        # "auto": the Mosaic kernel needs a real TPU (tests route to CPU
        # via jax_default_device; interpret mode would be pathologically
        # slow at D=256)
        default_dev = jax.config.jax_default_device
        platform = (
            default_dev.platform if default_dev is not None else jax.default_backend()
        )
        return platform == "tpu"

    @nn.compact
    def __call__(self, images, poses, intrinsics, keyview_idx, depth_range=None, num_views=None):
        """images: (B, V, H, W, 3) normalized; intrinsics: (B, V, 3, 3)

        ABSOLUTE pixel intrinsics; poses: (B, V, 4, 4); depth_range:
        (min (B,), max (B,)) or None. ``num_views`` (B,) marks real view
        slots when the view list is padded to a bucket (masked variance
        aggregation keeps results identical to the unpadded forward)."""
        B, V, H, W, _ = images.shape
        D = self.num_sampling_steps
        dtype = images.dtype
        cdt = jnp.bfloat16 if self.dtype in ("bfloat16", "bf16") else jnp.float32

        # depth hypotheses (reference: mvsnet.py:46-74) — linear between the
        # *first sample's* range values, as in the reference (min_depth[0]).
        if depth_range is None:
            lo, hi = 0.2, 100.0
            lo = jnp.full((), lo, dtype)
            hi = jnp.full((), hi, dtype)
        else:
            min_depth, max_depth = depth_range
            lo = jnp.asarray(min_depth, dtype).reshape(-1)[0]
            hi = jnp.asarray(max_depth, dtype).reshape(-1)[0]

        steps = jnp.linspace(0.0, 1.0, D, dtype=dtype)
        if self.sample_in_inv_depth_space:
            inv = 1.0 / hi + steps * (1.0 / lo - 1.0 / hi)
            depth_samples = (1.0 / inv)[::-1]
        else:
            depth_samples = lo + steps * (hi - lo)
        depth_samples = jnp.broadcast_to(depth_samples[None], (B, D))

        # projection matrices (reference: mvsnet.py:76-99): scale K by 1/4
        # (model stride), proj = [K@pose[:3,:4]; 0 0 0 1]; invert the key's.
        scale = jnp.asarray([[0.25] * 3, [0.25] * 3, [1.0] * 3], dtype)
        K_scaled = intrinsics * scale  # (B, V, 3, 3)
        # VPU contraction: an einsum would round the projection entries to
        # bf16 on the MXU (~0.03 px of sampling error, ops/homography.py)
        top = jnp.sum(
            K_scaled[:, :, :, :, None] * poses[:, :, None, :3, :4], axis=3
        )
        bottom = jnp.broadcast_to(
            jnp.asarray([0, 0, 0, 1], dtype).reshape(1, 1, 1, 4), (B, V, 1, 4)
        )
        proj = jnp.concatenate([top, bottom], axis=2)  # (B, V, 4, 4)

        is_key = jnp.arange(V)[None, :] == keyview_idx.reshape(-1, 1)
        proj_inv = jnp.linalg.inv(proj)
        proj = jnp.where(is_key[..., None, None], proj_inv, proj)

        # key/source ordering
        images_key, images_src = split_key_sources(images, keyview_idx)
        proj_key, proj_src = split_key_sources(proj, keyview_idx)

        # featurize all views at once
        feats = FeatureNet(dtype=cdt, name="feature")(
            images.reshape(B * V, H, W, 3).astype(cdt), train=self.train_bn
        )
        h, w, F = feats.shape[1], feats.shape[2], feats.shape[3]
        feats = feats.reshape(B, V, h, w, F)
        ref_feats, src_feats = split_key_sources(feats, keyview_idx)

        # variance cost volume: running sum / sum-of-squares over views
        # (reference: mvsnet.py:124-137) — associative, psum-able. Padded
        # view slots contribute zero and the divisor uses the real count.
        if num_views is not None:
            src_valid = (
                jnp.arange(V - 1)[None, :] < (num_views.reshape(-1, 1) - 1)
            ).astype(dtype)  # (B, V-1)
        else:
            src_valid = jnp.ones((B, V - 1), dtype)

        ref_volume = jnp.broadcast_to(ref_feats[:, None], (B, D, h, w, F))

        if self.view_parallel:
            # batched warps + associative masked sums: under a mesh the
            # "view" axis shards the (B, V-1, D, h, w, F) warped volumes
            # across chips and the sums become psums over ICI
            def warp_one(src_feat, src_proj, valid):
                warped = homo_warp(src_feat, src_proj, proj_key, depth_samples)
                return warped * valid[:, None, None, None, None]

            warped_all = jax.vmap(warp_one, in_axes=(1, 1, 1), out_axes=1)(
                src_feats, proj_src, src_valid
            )  # (B, V-1, D, h, w, F)
            warped_all = constrain(warped_all, "data", "view", "hyp")
            warped32 = warped_all.astype(jnp.float32)
            volume_sum = ref_volume.astype(jnp.float32) + jnp.sum(warped32, axis=1)
            volume_sq_sum = ref_volume.astype(jnp.float32) ** 2 + jnp.sum(
                warped32**2, axis=1
            )
        elif self._use_fused_warp():
            # fused banded-MXU warp+variance: the whole stage is one Pallas
            # kernel; per-view warped volumes never exist in HBM
            from ..ops.pallas.sweep_warp import warp_variance

            volume_variance = warp_variance(
                ref_feats,
                src_feats,
                proj_src,
                proj_key,
                depth_samples.astype(jnp.float32),
                src_valid=src_valid,
                # accumulation is f32 in-kernel; write directly in the
                # CostRegNet compute dtype (the scan path also casts the
                # f32 variance to cdt before the regularizer)
                out_dtype=cdt,
            )
            volume_variance = constrain(volume_variance, "data", "hyp")
            volume_sum = None  # not materialized on this path
        else:
            volume_sum = ref_volume.astype(jnp.float32)
            volume_sq_sum = volume_sum**2

            def add_view(carry, view):
                vsum, vsq = carry
                src_feat, src_proj, valid = view
                warped = homo_warp(src_feat, src_proj, proj_key, depth_samples)
                # barrier: without it XLA duplicates the (expensive) warp
                # gather into both the sum and the square consumers when
                # fusing — measured ~2x the gather cost at D=256
                warped = jax.lax.optimization_barrier(warped)
                warped = warped * valid[:, None, None, None, None]
                warped = warped.astype(jnp.float32)
                return (vsum + warped, vsq + warped**2), None

            (volume_sum, volume_sq_sum), _ = jax.lax.scan(
                add_view,
                (volume_sum, volume_sq_sum),
                (
                    jnp.moveaxis(src_feats, 1, 0),
                    jnp.moveaxis(proj_src, 1, 0),
                    jnp.moveaxis(src_valid, 1, 0),
                ),
            )
        if volume_sum is not None:
            count = (1.0 + jnp.sum(src_valid, axis=1)).reshape(B, 1, 1, 1, 1)
            volume_variance = volume_sq_sum / count - (volume_sum / count) ** 2
            # depth-hypothesis slabs across the "hyp" mesh axis: the 3D
            # regularizer partitions over D with halo exchanges, and the
            # softmax/expectation over D lowers to a global max+sum psum
            volume_variance = constrain(volume_variance, "data", "hyp")

        # 3D regularization + probability volume
        cost_reg = CostRegNet(dtype=cdt, conv3d_impl=self.conv3d_impl, name="cost_regularization")(
            volume_variance.astype(cdt), train=self.train_bn
        )[..., 0]  # (B, D, h, w)
        cost_reg = constrain(cost_reg, "data", "hyp")
        prob_volume = jax.nn.softmax(cost_reg, axis=1)
        depth = jnp.sum(prob_volume * depth_samples[:, :, None, None], axis=1)

        # confidence: prob mass over 4 consecutive hypotheses at the argmax
        # expectation index (reference: mvsnet.py:143-160)
        padded = jnp.pad(prob_volume, ((0, 0), (1, 2), (0, 0), (0, 0)))
        prob_sum4 = (
            padded[:, 0:D] + padded[:, 1 : D + 1] + padded[:, 2 : D + 2] + padded[:, 3 : D + 3]
        )
        d_index = jnp.sum(
            prob_volume * jnp.arange(D, dtype=dtype)[None, :, None, None], axis=1
        ).astype(jnp.int32)
        confidence = jnp.take_along_axis(prob_sum4, d_index[:, None], axis=1)[:, 0]
        uncertainty = 1.0 - confidence

        pred = {
            "depth": depth[..., None],  # (B, h, w, 1)
            "depth_uncertainty": uncertainty[..., None],
        }
        aux = {
            "depth": pred["depth"],
            "sampling_invdepths": 1.0 / depth_samples[:, ::-1],
        }
        return pred, aux


class MVSNet(ModelBase):
    def __init__(self, sample_in_inv_depth_space=False, num_sampling_steps=192, weights=None, train=False, seed=0, view_parallel=False, dtype="float32", conv3d_impl="dz2d", warp_impl="auto"):
        if train:
            # the fused warp kernel is forward-only (no VJP yet)
            warp_impl = "xla"
        module = MVSNetModule(
            sample_in_inv_depth_space=sample_in_inv_depth_space,
            num_sampling_steps=num_sampling_steps,
            train_bn=False,
            view_parallel=view_parallel,
            dtype=dtype,
            conv3d_impl=conv3d_impl,
            warp_impl=warp_impl,
        )
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

    def apply_fn(self, variables, images, poses, intrinsics, keyview_idx, depth_range=None, num_views=None, **_):
        return self.module.apply(
            variables, images, poses, intrinsics, keyview_idx, depth_range, num_views
        )

    def input_adapter(self, images, keyview_idx, poses=None, intrinsics=None, depth_range=None):
        """Multiple-of-32 resize + ImageNet normalization

        (reference: mvsnet.py:170-199)."""
        orig_ht, orig_wd = images[0].shape[-2:]
        ht = int(math.ceil(orig_ht / 32.0) * 32.0)
        wd = int(math.ceil(orig_wd / 32.0) * 32.0)
        if (orig_ht, orig_wd) != (ht, wd):
            sx, sy = wd / orig_wd, ht / orig_ht
            images = [np_resize_bilinear(img, (ht, wd)) for img in images]
            intrinsics = [
                K * np.array([[sx, 1, sx], [1, sy, sy], [1, 1, 1]], dtype=np.float32)
                for K in intrinsics
            ]

        shift = np.array([0.485, 0.456, 0.406], np.float32)
        scale = np.array([0.229, 0.224, 0.225], np.float32)
        images = [
            ((img / 255.0) - shift[:, None, None]) / scale[:, None, None]
            for img in images
        ]

        # bucket the view list (see robust_mvd.input_adapter)
        num_total = len(images)
        num_sources = num_total - 1
        bucket = 1 if num_sources <= 1 else 2 ** int(np.ceil(np.log2(num_sources)))
        images, poses, intrinsics = list(images), list(poses), list(intrinsics)
        while len(images) < 1 + bucket:
            images.append(images[-1])
            poses.append(poses[-1])
            intrinsics.append(intrinsics[-1])

        images_nhwc = np.stack(images, axis=1).transpose(0, 1, 3, 4, 2).astype(np.float32)
        B = images_nhwc.shape[0]
        sample = {
            "images": jnp.asarray(images_nhwc),
            "poses": jnp.asarray(np.stack(poses, axis=1).astype(np.float32)),
            "intrinsics": jnp.asarray(np.stack(intrinsics, axis=1).astype(np.float32)),
            "keyview_idx": jnp.asarray(np.asarray(keyview_idx).reshape(-1), jnp.int32),
            "num_views": jnp.full((B,), num_total, dtype=jnp.int32),
        }
        if depth_range is not None:
            lo, hi = depth_range
            sample["depth_range"] = (
                jnp.asarray(np.asarray(lo).reshape(-1), jnp.float32),
                jnp.asarray(np.asarray(hi).reshape(-1), jnp.float32),
            )
        return sample

    def output_adapter(self, model_output):
        pred, aux = model_output

        def to_chw(x):
            if hasattr(x, "ndim") and x.ndim == 4:
                return np.asarray(x).transpose(0, 3, 1, 2)
            return np.asarray(x) if hasattr(x, "ndim") else x

        from .helpers import LazyNumpyDict

        pred = {k: to_chw(v) for k, v in pred.items()}
        return pred, LazyNumpyDict(aux, to_chw)


@register_model(trainable=False)
def mvsnet_train(pretrained=True, weights=None, train=False, **kwargs):
    """(reference: mvsnet.py:206-217 — registered without pretrained weights)"""
    cfg = {"sample_in_inv_depth_space": False, "num_sampling_steps": 256}
    cfg.update(kwargs)
    return MVSNet(weights=weights, train=train, **cfg)
