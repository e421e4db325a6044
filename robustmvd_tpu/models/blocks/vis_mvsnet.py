"""Vis-MVSNet blocks in flax (channel-last, 2D + 3D).

Reference parity:
- modular residual U-Net used for 2D feature extraction and 3D cost
  regularization (rmvd/models/blocks/vis_mvsnet_unet_modular.py:14-242);
- ``FeatExt`` 3-scale feature extractor
  (vis_mvsnet_feature_extractor.py:12-29);
- ``SingleStage`` per-pair cost volumes (homography warp + 8-group
  correlation), pair regularization, uncertainty net on prob-volume
  entropy, soft/hard/average/uwta/maxpool fusion, fused regularization and
  windowed soft-argmin (vis_mvsnet_singlestage.py:21-348).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.conv3d import conv3d_op

from ...ops.homography import get_homographies, homography_warping
from ...ops.interpolate import resize_bilinear
from ...ops.reductions import entropy, groupwise_correlation, soft_argmin
from ...parallel.context import constrain


def scale_camera(cam, scale):
    """Rescale the intrinsics plane of a (B, 2, 4, 4) cam tensor

    (reference: blocks/utils.py:189-216)."""
    if not isinstance(scale, tuple):
        scale = (scale, scale)
    sx, sy = scale
    mult = jnp.ones((4, 4), cam.dtype)
    mult = mult.at[0, 0].set(sx).at[0, 2].set(sx).at[1, 1].set(sy).at[1, 2].set(sy)
    return jnp.stack([cam[:, 0], cam[:, 1] * mult], axis=1)


def _conv(features, k, s, dim, name, dtype=jnp.float32, conv3d_impl="xla"):
    if dim == 3 and k == 3 and s == 1 and conv3d_impl != "xla":
        # lane-packed / dz-decomposed lowering for the small-channel 3D
        # convs (ops/conv3d.py) — identical parameters to nn.Conv
        return conv3d_op(
            features, use_bias=False, dtype=dtype, name=name, impl=conv3d_impl
        )
    if dim == 3 and k == 3 and s == 2 and conv3d_impl == "dz2d":
        from ...ops.conv3d import Conv3dDz2d

        return Conv3dDz2d(features, stride=2, use_bias=False, dtype=dtype, name=name)
    pad = ((k // 2, k // 2),) * dim
    return nn.Conv(
        features,
        kernel_size=(k,) * dim,
        strides=(s,) * dim,
        padding=pad,
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class _BN(nn.Module):
    name_: str = "bn"

    @nn.compact
    def __call__(self, x, train=False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=self.name_
        )(x)


class BasicBlock(nn.Module):
    """Residual basic block (reference: vis_mvsnet_unet_modular.py:14-70)."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    dim: int = 2
    dtype: object = jnp.float32
    conv3d_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train=False):
        dt = self.dtype
        impl = self.conv3d_impl
        residual = x
        if (
            self.dim == 3 and self.stride == 2
            and impl != "xla" and x.shape[-1] == 8
        ):
            # stride-2 banded packing wins only at Cin=8 (ops/conv3d.py)
            from ...ops.conv3d import Conv3dPackedS2

            conv1 = Conv3dPackedS2(
                self.planes, use_bias=False, dtype=dt, name="conv1"
            )
        else:
            conv1 = _conv(self.planes, 3, self.stride, self.dim, "conv1", dt, impl)
        out = conv1(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dim, "conv2", dt, impl)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="bn2")(out)
        if self.use_downsample:
            residual = _conv(self.planes, 1, self.stride, self.dim, "downsample_conv", dt)(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="downsample_bn"
            )(residual)
        return nn.relu(out + residual.astype(out.dtype))


class ResLayer(nn.Module):
    """Sequence of BasicBlocks (reference: _make_layer, :73-113)."""

    planes: int
    blocks: int
    stride: int = 1
    in_planes: int = -1
    dim: int = 2
    dtype: object = jnp.float32
    conv3d_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train=False):
        needs_down = self.stride != 1 or x.shape[-1] != self.planes
        x = BasicBlock(
            self.planes, self.stride, use_downsample=needs_down, dim=self.dim,
            dtype=self.dtype, conv3d_impl=self.conv3d_impl, name="block0"
        )(x, train)
        for i in range(1, self.blocks):
            x = BasicBlock(
                self.planes, 1, dim=self.dim, dtype=self.dtype,
                conv3d_impl=self.conv3d_impl, name=f"block{i}"
            )(x, train)
        return x


class TorchDeconv(nn.Module):
    """torch ConvTranspose(k3, s2, p1, output_padding=1, bias=False):

    out = 2*in. Works for dim=2 or dim=3 (input-dilated correlation)."""

    features: int
    dim: int = 2
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = 3
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k,) * self.dim + (in_features, self.features),
        )
        if self.dim == 3:
            from ...ops.conv3d import conv3d_transposed_dz2d

            return conv3d_transposed_dz2d(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                stride=2,
                output_padding=1,
            )
        pads = ((1, 2),) * self.dim
        dn = ("NHWC", "HWIO", "NHWC") if self.dim == 2 else ("NDHWC", "DHWIO", "NDHWC")
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,) * self.dim,
            padding=pads,
            lhs_dilation=(2,) * self.dim,
            dimension_numbers=dn,
        )


class UNet(nn.Module):
    """Parameterized residual U-Net, 2D or 3D

    (reference: vis_mvsnet_unet_modular.py:115-242)."""

    enc: int
    dec: int
    bottom_filters: Sequence[int]
    filters: Sequence[int]
    head_filters: Sequence[int]
    dim: int = 2
    dtype: object = jnp.float32
    conv3d_impl: str = "xla"

    @nn.compact
    def __call__(self, x, multi_scale=1, train=False):
        dt = self.dtype
        impl = self.conv3d_impl
        idx = 0
        for f in self.bottom_filters:
            stride = 1 if idx == 0 else 2
            x = ResLayer(f, self.enc, stride, dim=self.dim, dtype=dt, conv3d_impl=impl, name=f"bottom_{idx}")(x, train)
            idx += 1

        enc_out = []
        for f in self.filters:
            stride = 1 if idx == 0 else 2
            x = ResLayer(f, self.enc, stride, dim=self.dim, dtype=dt, conv3d_impl=impl, name=f"enc_{idx}")(x, train)
            enc_out.append(x)
            idx += 1

        dec_out = [x]
        for i, f in enumerate(self.filters[-2::-1]):
            x = TorchDeconv(f, dim=self.dim, dtype=dt, name=f"dec_{idx}_deconv")(x)
            x = jnp.concatenate([x, enc_out[-2 - i].astype(x.dtype)], axis=-1)
            x = _conv(f, 3, 1, self.dim, f"dec_{idx}_post", dt, impl)(x)
            if self.dec > 0:
                x = ResLayer(f, self.dec, 1, dim=self.dim, dtype=dt, conv3d_impl=impl, name=f"dec_{idx}_res")(x, train)
            dec_out.append(x)
            idx += 1

        for f in self.head_filters:
            x = TorchDeconv(f, dim=self.dim, dtype=dt, name=f"head_{idx}_deconv")(x)
            if self.dec > 0:
                x = ResLayer(f, self.dec, 1, dim=self.dim, dtype=dt, conv3d_impl=impl, name=f"head_{idx}_res")(x, train)
            dec_out.append(x)
            idx += 1

        if multi_scale == 1:
            return x
        return dec_out[-multi_scale:]


class FeatExt(nn.Module):
    """init conv s2 + 2D U-Net, 3 output scales (1/8, 1/4, 1/2), 32ch each

    (reference: vis_mvsnet_feature_extractor.py:12-29)."""

    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        dt = self.dtype
        x = nn.Conv(16, (5, 5), (2, 2), padding=((2, 2), (2, 2)), use_bias=False, dtype=dt, name="init_conv")(x.astype(dt))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="init_bn")(x)
        x = nn.relu(x)
        out1, out2, out3 = UNet(
            enc=2, dec=1, bottom_filters=(), filters=(32, 64, 128), head_filters=(),
            dim=2, dtype=dt, name="unet",
        )(x, multi_scale=3, train=train)
        f1 = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=dt, name="final_conv_1")(out1)
        f2 = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=dt, name="final_conv_2")(out2)
        f3 = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=dt, name="final_conv_3")(out3)
        return f1, f2, f3


class Reg(nn.Module):
    """(reference: vis_mvsnet_singlestage.py:21-29)"""

    dtype: object = jnp.float32
    conv3d_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train=False):
        return UNet(
            enc=1, dec=0, bottom_filters=(), filters=(8, 16), head_filters=(),
            dim=3, dtype=self.dtype, conv3d_impl=self.conv3d_impl, name="unet",
        )(x, train=train)


class RegPair(nn.Module):
    conv3d_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        # score head in fp32 (feeds the softmax/soft-argmin)
        return conv3d_op(
            1, use_bias=False, dtype=jnp.float32, name="final_conv",
            impl=self.conv3d_impl,
        )(x.astype(jnp.float32))


class RegFuse(nn.Module):
    dtype: object = jnp.float32
    conv3d_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train=False):
        x = UNet(
            enc=1, dec=0, bottom_filters=(), filters=(8, 16), head_filters=(),
            dim=3, dtype=self.dtype, conv3d_impl=self.conv3d_impl, name="unet",
        )(x, train=train)
        return conv3d_op(
            1, use_bias=False, dtype=jnp.float32, name="final_conv",
            impl=self.conv3d_impl,
        )(x.astype(jnp.float32))


class UncertNet(nn.Module):
    """(reference: vis_mvsnet_singlestage.py:57-76)"""

    num_heads: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        # small net on the (fp32) entropy map; heads stay fp32 — they feed
        # exp(-w) fusion weights where bf16 would quantize the weighting
        out = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv1_conv")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="conv1_bn")(out)
        out = nn.relu(out)
        out = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv2_conv")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="conv2_bn")(out)
        out = nn.relu(out)
        out = out + x
        return [
            nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name=f"head_{i}")(out)
            for i in range(self.num_heads)
        ]


class SingleStage(nn.Module):
    """One cascade stage (reference: vis_mvsnet_singlestage.py:79-348).

    ``dtype`` selects the compute precision of the 3D regularizers and the
    cost-volume build; score volumes, soft-argmin, entropy, uncertainty
    heads and fusion-weight math stay fp32 (mixed-precision template)."""

    dtype: object = jnp.float32
    conv3d_impl: str = "xla"
    # "auto" fuses the per-pair homography warp + group-wise correlation
    # into the banded-MXU Pallas kernel on TPU (ops/pallas/sweep_warp.py);
    # "xla" keeps the get_homographies + homography_warping path
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
    def __call__(
        self,
        ref_feat,
        ref_cam,
        srcs_feat,
        srcs_cam,
        depth_num,
        mode="soft",
        depth_start_override=None,
        depth_interval_override=None,
        s_scale=1,
        src_valid=None,
        train=False,
    ):
        """ref_feat: (B, h, w, C); srcs_feat: list of (B, h, w, C);

        cams: (B, 2, 4, 4). depth_start/interval overrides: (B, 1, 1, 1) or
        (B, 1, h, w) channel-first-style maps like the reference (n1hw).
        Returns (est_depth (B,1,h,w), prob_map (B,1,h,w), pair_results)."""
        B, h, w, C = ref_feat.shape
        dtype = ref_feat.dtype

        depth_start = (
            ref_cam[:, 1:2, 3:4, 0:1]
            if depth_start_override is None
            else depth_start_override
        )
        depth_interval = (
            ref_cam[:, 1:2, 3:4, 1:2]
            if depth_interval_override is None
            else depth_interval_override
        )

        reg = Reg(dtype=self.dtype, conv3d_impl=self.conv3d_impl, name="reg")
        reg_pair = RegPair(conv3d_impl=self.conv3d_impl, name="reg_pair")
        reg_fuse = RegFuse(dtype=self.dtype, conv3d_impl=self.conv3d_impl, name="reg_fuse")
        uncert_net = UncertNet(2, name="uncert_net")

        # (B, D, h, w, C) reference volume
        ref_vol = jnp.broadcast_to(ref_feat[:, None], (B, depth_num, h, w, C))

        pair_results = []
        # fp32 fusion accumulators regardless of compute dtype
        fused_interm = jnp.zeros((B, depth_num, h, w, 8), jnp.float32)
        weight_sum = jnp.zeros((B, 1, h, w, 1), jnp.float32)
        min_weight = None
        maxpool_init = True

        if src_valid is None:
            src_valid = [jnp.ones((B,), dtype)] * len(srcs_feat)

        # ---- phase 1: per-pair cost volumes --------------------------------
        cost_volumes = []
        for view_idx, (src_feat, src_cam) in enumerate(zip(srcs_feat, srcs_cam)):
            ref_cam_s = scale_camera(ref_cam, 1 / s_scale)
            src_cam_s = scale_camera(src_cam, 1 / s_scale)
            d_sched = depth_start + depth_interval * jnp.arange(
                depth_num, dtype=jnp.float32
            ).reshape(1, depth_num, 1, 1)  # (B, D, H', W')

            if self._use_fused_warp():
                # fused banded-MXU warp + group-wise correlation: the
                # homography is affine in inverse depth, H = A + B/(d+1e-9)
                from ...ops.homography import get_homography_coeffs
                from ...ops.homography import _mm as _mm33
                from ...ops.pallas.sweep_warp import homography_group_cost

                Amat, Bmat = get_homography_coeffs(ref_cam_s, src_cam_s)
                # fold the +0.5 pixel-center grid offset into the coeffs
                S = jnp.asarray(
                    [[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]],
                    jnp.float32,
                )[None]
                Amat = _mm33(Amat, S)
                Bmat = _mm33(Bmat, S)
                w_dense = jnp.broadcast_to(
                    1.0 / (d_sched + 1e-9), (B, depth_num, h, w)
                )
                cost_volume = homography_group_cost(
                    ref_feat, src_feat, Amat, Bmat, w_dense, groups=8,
                    out_dtype=dtype,
                )
            else:
                Hs = get_homographies(
                    ref_cam_s, src_cam_s, depth_num, depth_start, depth_interval
                )  # (B, D, H', W', 3, 3)
                Hs = jax.lax.optimization_barrier(Hs)
                src_feat = jax.lax.optimization_barrier(src_feat)

                # warp all D hypotheses at once: fold D into batch
                src_rep = jnp.broadcast_to(src_feat[:, None], (B, depth_num, h, w, C))
                src_rep = src_rep.reshape(B * depth_num, h, w, C)
                Hp, Wp = Hs.shape[2], Hs.shape[3]
                if (Hp, Wp) == (1, 1):
                    H_flat = Hs.reshape(B * depth_num, 3, 3)
                else:
                    H_flat = Hs.reshape(B * depth_num, Hp, Wp, 3, 3)
                warped = homography_warping(src_rep, H_flat)
                # barrier: on the TPU backend, letting XLA fuse the warp
                # gather into the correlation consumer miscompiles to NaN
                # at small feature sizes (isolated warp+corr is finite;
                # PARITY.md round-5 finding 4) — and it also duplicates
                # the gather into multiple consumers (round-4 finding)
                warped = jax.lax.optimization_barrier(warped)
                warped = warped.reshape(B, depth_num, h, w, C)

                cost_volume = groupwise_correlation(ref_vol, warped, 8, axis=-1)
            # depth-hypothesis slabs across the "hyp" mesh axis (no-op
            # off-mesh): the 3D regs partition over D with halo exchanges,
            # soft_argmin's softmax lowers to a global max+sum psum
            cost_volume = constrain(cost_volume, "data", "hyp")
            cost_volumes.append(cost_volume)

        # ---- phase 2: regularize all pairs ---------------------------------
        # In eval the P pair volumes batch through the (shared-parameter)
        # regularizers in ONE pass — each Reg/RegPair/UncertNet layer at
        # these sizes is dispatch-floor bound, so P-fold batching removes
        # (P-1)/P of the per-layer overhead. Training keeps the reference's
        # sequential per-pair BN-statistics semantics.
        P = len(cost_volumes)
        if P > 1 and not train:
            cv_all = jnp.concatenate(cost_volumes, axis=0)  # (P*B, D, h, w, 8)
            interm_all = reg(cv_all, train=train)
            score_all = reg_pair(interm_all)[..., 0]
            prob_all, edc_all = soft_argmin(score_all, axis=1, keepdims=True)
            ent_all = entropy(prob_all, axis=1, keepdims=True)
            heads_all = uncert_net(
                jnp.transpose(ent_all, (0, 2, 3, 1)), train=train
            )
            heads_all = [jnp.transpose(hd, (0, 3, 1, 2)) for hd in heads_all]
            interm_list = jnp.split(interm_all, P, axis=0)
            edc_list = jnp.split(edc_all, P, axis=0)
            heads_list = [
                [jnp.split(hd, P, axis=0)[p] for hd in heads_all]
                for p in range(P)
            ]
        else:
            interm_list, edc_list, heads_list = [], [], []
            for cost_volume in cost_volumes:
                interm = reg(cost_volume, train=train)  # (B, D, h, w, 8)
                score_volume = reg_pair(interm)[..., 0]  # (B, D, h, w)
                prob_volume, est_depth_class = soft_argmin(
                    score_volume, axis=1, keepdims=True
                )
                ent = entropy(prob_volume, axis=1, keepdims=True)
                heads = uncert_net(
                    jnp.transpose(ent, (0, 2, 3, 1)), train=train
                )  # list of (B, h, w, 1)
                heads = [jnp.transpose(hd, (0, 3, 1, 2)) for hd in heads]
                interm_list.append(interm)
                edc_list.append(est_depth_class)
                heads_list.append(heads)

        # ---- phase 3: visibility-aware fusion ------------------------------
        for view_idx in range(P):
            # per-view validity scalar for padded view slots: invalid views
            # contribute zero fusion weight (soft/hard/average modes)
            valid = src_valid[view_idx].reshape(B, 1, 1, 1, 1)
            est_depth = edc_list[view_idx] * depth_interval + depth_start
            heads = heads_list[view_idx]
            pair_results.append([est_depth, heads])

            # heads[0] is (B, 1, h, w); broadcastable weight for the
            # channel-last volume (B, D, h, w, 8) is (B, 1, h, w, 1).
            interm = interm_list[view_idx].astype(jnp.float32)
            if mode == "soft":
                weight = jnp.exp(-heads[0])[..., None] * valid
                weight_sum = weight_sum + weight
                fused_interm = fused_interm + interm * weight
            elif mode == "hard":
                weight = ((heads[0] < 0).astype(dtype)[..., None] + 1e-4) * valid
                weight_sum = weight_sum + weight
                fused_interm = fused_interm + interm * weight
            elif mode == "average":
                fused_interm = fused_interm + interm * valid
            elif mode == "uwta":
                weight = heads[0][..., None]
                if min_weight is None:
                    min_weight = weight
                    mask = jnp.ones_like(weight)
                else:
                    mask = (weight < min_weight).astype(dtype)
                    min_weight = weight * mask + min_weight * (1 - mask)
                fused_interm = interm * mask + fused_interm * (1 - mask)
            elif mode == "maxpool":
                if maxpool_init:
                    fused_interm = fused_interm + interm
                    maxpool_init = False
                else:
                    fused_interm = jnp.maximum(fused_interm, interm)

        if mode in ("soft", "hard"):
            fused_interm = fused_interm / weight_sum
        elif mode == "average":
            n_valid = sum(v.reshape(B, 1, 1, 1, 1) for v in src_valid)
            fused_interm = fused_interm / n_valid

        fused_interm = constrain(fused_interm, "data", "hyp")
        score_volume = reg_fuse(fused_interm, train=train)[..., 0]  # (B, D, h, w)
        prob_volume, est_depth_class, prob_map = soft_argmin(
            score_volume, axis=1, keepdims=True, window=2
        )
        est_depth = est_depth_class * depth_interval + depth_start
        return est_depth, prob_map, pair_results
