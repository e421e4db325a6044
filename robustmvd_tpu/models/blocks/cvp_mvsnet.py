"""CVP-MVSNet components in flax (channel-last).

Reference parity (rmvd/models/blocks/cvp_mvsnet_components.py):
feature pyramid (:40-83), 3D CostRegNet (:85-128), per-scale intrinsics
conditioning (:144-159), uniform sweeping hypotheses (:162-189), R,t-based
plane-sweep warping (:192-246, shared op), epipolar local-refinement
hypotheses (:248-373), variance cost volume across views (:375-456).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.conv3d import conv3d_op

from ...ops.homography import rt_planesweep_warp


def conv_lrelu01(features, name):
    def block(x):
        x = nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)), use_bias=True, name=name)(x)
        return nn.leaky_relu(x, negative_slope=0.1)

    return block


class FeaturePyramid(nn.Module):
    """Shared conv stack applied at `scales` image scales

    (reference: cvp_mvsnet_components.py:40-83). Returns a list from full
    resolution to coarsest. ``dtype`` selects the conv compute precision
    (params fp32; mixed-precision template)."""

    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, img, scales=5):
        convs = [
            ("conv0aa", 64), ("conv0ba", 64), ("conv0bb", 64), ("conv0bc", 32),
            ("conv0bd", 32), ("conv0be", 32), ("conv0bf", 16), ("conv0bg", 16),
            ("conv0bh", 16),
        ]
        layers = [
            nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=True, dtype=self.dtype, name=name)
            for name, f in convs
        ]

        def run(x):
            x = x.astype(self.dtype)
            for layer in layers:
                x = nn.leaky_relu(layer(x), negative_slope=0.1)
            return x

        fp = [run(img)]
        from ...ops.interpolate import resize_bilinear

        for _ in range(scales - 1):
            img = jax.lax.stop_gradient(
                resize_bilinear(img, (img.shape[1] // 2, img.shape[2] // 2))
            )
            fp.append(run(img))
        return fp


class ConvBnReLU3D(nn.Module):
    features: int
    stride: int = 1
    dtype: object = jnp.float32
    conv3d_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train=False):
        if self.stride == 1:
            conv = conv3d_op(
                self.features, use_bias=False, dtype=self.dtype, name="conv",
                impl=self.conv3d_impl,
            )
        elif self.stride == 2 and self.conv3d_impl == "dz2d":
            from ...ops.conv3d import Conv3dDz2d

            conv = Conv3dDz2d(
                self.features, stride=2, use_bias=False, dtype=self.dtype,
                name="conv",
            )
        else:
            conv = nn.Conv(
                self.features, (3, 3, 3), strides=(self.stride,) * 3,
                padding=((1, 1),) * 3, use_bias=False, dtype=self.dtype, name="conv",
            )
        x = conv(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class _Deconv3d(nn.Module):
    """torch ConvTranspose3d with configurable stride/output_padding."""

    features: int
    stride: int = 2
    output_padding: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = 3
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k, k, k, in_features, self.features),
        )
        from ...ops.conv3d import conv3d_transposed_dz2d

        return conv3d_transposed_dz2d(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            stride=self.stride,
            output_padding=self.output_padding,
        )


class CostRegNet(nn.Module):
    """(reference: cvp_mvsnet_components.py:85-128). Input (B, D, h, w, 16);

    output (B, D, h, w) logits."""

    dtype: object = jnp.float32
    conv3d_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train=False):
        dt = self.dtype
        impl = self.conv3d_impl
        conv0 = ConvBnReLU3D(16, dtype=dt, conv3d_impl=impl, name="conv0a")(ConvBnReLU3D(16, dtype=dt, conv3d_impl=impl, name="conv0")(x.astype(dt), train), train)
        conv2 = ConvBnReLU3D(32, dtype=dt, conv3d_impl=impl, name="conv2a")(
            ConvBnReLU3D(32, dtype=dt, conv3d_impl=impl, name="conv2")(
                ConvBnReLU3D(32, stride=2, dtype=dt, conv3d_impl=impl, name="conv1")(conv0, train), train
            ),
            train,
        )
        conv4 = ConvBnReLU3D(64, dtype=dt, conv3d_impl=impl, name="conv4a")(
            ConvBnReLU3D(64, dtype=dt, conv3d_impl=impl, name="conv4")(
                ConvBnReLU3D(64, dtype=dt, conv3d_impl=impl, name="conv3")(conv2, train), train
            ),
            train,
        )
        up5 = _Deconv3d(32, stride=1, output_padding=0, dtype=dt, name="conv5_deconv")(conv4)
        up5 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="conv5_bn")(up5)
        conv5 = conv2 + nn.relu(up5)
        up6 = _Deconv3d(16, stride=2, output_padding=1, dtype=dt, name="conv6_deconv")(conv5)
        up6 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="conv6_bn")(up6)
        conv6 = conv0 + nn.relu(up6)
        # prediction head in fp32 (feeds the softmax/depth regression)
        prob = conv3d_op(1, use_bias=True, dtype=jnp.float32, name="prob0", impl=impl)(conv6.astype(jnp.float32))
        return prob[..., 0]


def condition_intrinsics(intrinsics, img_hw, fp_shapes_hw):
    """Per-scale intrinsics (reference: :144-159). Returns (B, nScale, 3, 3)."""
    outs = []
    for (fh, fw) in fp_shapes_hw:
        ratio = img_hw[0] / fh
        factor = jnp.asarray([[1 / ratio], [1 / ratio], [1.0]], intrinsics.dtype)
        outs.append(intrinsics * factor)
    return jnp.stack(outs, axis=1)


def cal_sweeping_depth_hypos(depth_min, depth_max, nhypothesis_init=48):
    """Uniform sweeping hypotheses (reference: :162-189): uses the FIRST

    sample's range for the whole batch, inclusive endpoints (torch.range)."""
    B = depth_min.shape[0]
    lo = depth_min.reshape(-1)[0]
    hi = depth_max.reshape(-1)[0]
    step = (hi - lo) / (nhypothesis_init - 1)
    hypos = lo + step * jnp.arange(nhypothesis_init, dtype=jnp.float32)
    return jnp.broadcast_to(hypos[None], (B, nhypothesis_init))


def cal_depth_hypo_interval(ref_depths, ref_K, src_K, ref_ex, src_ex):
    """Mean one-pixel depth interval from epipolar geometry

    (reference: :248-373, "test" branch): for each pixel, move the source
    projection one pixel along the epipolar line and solve for the depth
    change; the per-batch scalar is |delta_d| averaged over pixels. The
    reference computes this in float64; here float32 (the result is a
    batch-mean scalar, so the precision loss is negligible).

    ref_depths: (B, H, W); ref_K/src_K: (B, 3, 3); ref_ex/src_ex: (B, 4, 4)
    with src the FIRST source view, matching the reference (:314).
    Returns (B,) interval scalars.
    """
    B, H, W = ref_depths.shape
    dtype = jnp.float32

    xx, yy = jnp.meshgrid(
        jnp.arange(W, dtype=dtype), jnp.arange(H, dtype=dtype), indexing="ij"
    )  # matches the reference's (x, y) meshgrid over (width, height)
    X = jnp.stack([xx.reshape(-1), yy.reshape(-1), jnp.ones(H * W, dtype)], axis=0)  # (3, P)

    def per_batch(depth, rK, sK, rE, sE):
        D1 = jnp.swapaxes(depth, 0, 1).reshape(-1)  # transpose-then-flatten (:299)
        D2 = D1 + 1

        rK_inv = jnp.linalg.inv(rK)
        ray1 = rK_inv @ (X * D1)
        ray2 = rK_inv @ (X * D2)
        ones = jnp.ones((1, H * W), dtype)
        X1 = jnp.linalg.inv(rE) @ jnp.concatenate([ray1, ones], axis=0)
        X2 = jnp.linalg.inv(rE) @ jnp.concatenate([ray2, ones], axis=0)
        X1 = (sE @ X1)[:3]
        X2 = (sE @ X2)[:3]
        X1 = sK @ X1
        X1_d = X1[2]
        X1 = X1 / X1_d
        X2 = sK @ X2
        X2 = X2 / X2[2]

        k = (X2[1] - X1[1]) / (X2[0] - X1[0])
        theta = jnp.arctan(k)
        X3 = X1 + jnp.stack(
            [jnp.cos(theta), jnp.sin(theta), jnp.zeros_like(theta)], axis=0
        )

        A = rK @ rE[:3, :3] @ jnp.linalg.inv(sK @ sE[:3, :3])
        tmp1 = X1_d * (A @ X1)  # (3, P)
        tmp2 = A @ X3

        # solve the 2x2 system rows 1: of [X | tmp2] x = tmp1 (:345-351).
        # Closed-form Cramer instead of batched jnp.linalg.solve: the LU
        # lowering of 81920 tiny (2,2) systems is scalar-loop poison on TPU
        # (it alone cost ~51 ms of the 256x320 forward); only the first
        # unknown (delta_d) is needed.
        a, c = X[1], X[2]  # (P,)
        b, d = tmp2[1], tmp2[2]
        e, f = tmp1[1], tmp1[2]
        det = a * d - b * c
        delta_d = (e * d - b * f) / det
        return jnp.mean(jnp.abs(delta_d))

    return jax.vmap(per_batch)(ref_depths, ref_K, src_K, ref_ex, src_ex)


def cal_depth_hypos(
    ref_depths, ref_K, src_K, ref_ex, src_ex, mode="test", d=4, train_interval=6.8085
):
    """Local refinement hypotheses: 2d levels around the upsampled depth

    (reference: :248-373). Returns (B, 2d, H, W)."""
    B, H, W = ref_depths.shape
    levels = jnp.arange(-d, d, dtype=jnp.float32)  # (2d,)
    if mode == "train":
        interval = jnp.full((B,), train_interval, jnp.float32)
    else:
        interval = cal_depth_hypo_interval(ref_depths, ref_K, src_K, ref_ex, src_ex)
    return ref_depths[:, None] + levels[None, :, None, None] * interval[:, None, None, None]


def proj_cost_volume(
    ref_feature, src_features, ref_K, src_Ks, ref_ex, src_exs, depth_hypos,
    src_valid=None, impl="xla", out_dtype=None,
):
    """Variance cost volume across views with per-pixel hypotheses

    (reference: :375-456). ref_feature: (B, H, W, C); src_features: list of
    (B, H, W, C); depth_hypos: (B, D, H, W); src_valid: optional (B, nsrc)
    validity for padded view slots; impl: "xla" (rt_planesweep_warp loop)
    or "pallas_fused" (banded-MXU fused kernel, ops/pallas/sweep_warp.py).
    Returns (B, D, H, W, C)."""
    B, H, W, C = ref_feature.shape
    D = depth_hypos.shape[1]
    nsrc = len(src_features)
    dtype = ref_feature.dtype
    if src_valid is None:
        src_valid = jnp.ones((B, nsrc), dtype)

    def proj_mat(K, ex):
        # VPU contraction: an einsum would round the projection entries to
        # bf16 on the MXU (~0.03 px sampling error, ops/homography.py)
        top = jnp.sum(K[:, :, :, None] * ex[:, None, :3, :], axis=2)
        bottom = jnp.broadcast_to(
            jnp.asarray([0, 0, 0, 1], dtype).reshape(1, 1, 4), (B, 1, 4)
        )
        return jnp.concatenate([top, bottom], axis=1)

    ref_proj = proj_mat(ref_K, ref_ex)
    ref_proj_inv = jnp.linalg.inv(ref_proj)

    def src_from_ref(src_idx):
        p = proj_mat(src_Ks[:, src_idx], src_exs[:, src_idx])
        return jnp.sum(p[:, :, :, None] * ref_proj_inv[:, None, :, :], axis=2)

    if impl == "pallas_fused":
        from ...ops.pallas.sweep_warp import warp_variance_dense

        projs = jnp.stack(
            [src_from_ref(i) for i in range(nsrc)], axis=1
        )  # (B, nsrc, 4, 4)
        return warp_variance_dense(
            ref_feature,
            jnp.stack(src_features, axis=1),
            projs[:, :, :3, :3],
            projs[:, :, :3, 3],
            depth_hypos,
            src_valid=src_valid,
            out_dtype=out_dtype or jnp.float32,
            band=4,
        )

    hypos_flat = depth_hypos.reshape(B, D, H * W)
    ref_volume = jnp.broadcast_to(ref_feature[:, None], (B, D, H, W, C))
    # fp32 variance accumulation regardless of feature dtype (bf16
    # E[x^2]-E[x]^2 cancels catastrophically)
    volume_sum = ref_volume.astype(jnp.float32)
    volume_sq_sum = volume_sum**2

    for src_idx in range(nsrc):
        proj = src_from_ref(src_idx)
        rot = proj[:, :3, :3]
        trans = proj[:, :3, 3]
        warped = rt_planesweep_warp(src_features[src_idx], rot, trans, hypos_flat)
        # barrier: keep XLA from duplicating the warp gather into both the
        # sum and square consumers (see models/mvsnet.py add_view)
        warped = jax.lax.optimization_barrier(warped)
        warped = warped.astype(jnp.float32) * src_valid[:, src_idx].reshape(B, 1, 1, 1, 1)
        volume_sum = volume_sum + warped
        volume_sq_sum = volume_sq_sum + warped**2

    count = (1.0 + jnp.sum(src_valid, axis=1)).reshape(B, 1, 1, 1, 1)
    return volume_sq_sum / count - (volume_sum / count) ** 2
