"""DispNet-style blocks for the robust_mvd baseline, in flax (NHWC).

Re-designs the reference's DispNet encoder / context encoder / cost-volume
encoder / 6-scale decoder / learned fusion
(rmvd/models/blocks/dispnet_encoder.py, dispnet_context_encoder.py,
dispnet_costvolume_encoder.py, dispnet_decoder.py, learned_fusion.py) as
channel-last flax modules. Convs use explicit torch-style symmetric padding
so spatial shapes match the reference exactly; module/parameter names mirror
the torch module names so (a) torch checkpoints map mechanically and (b) the
loss's weight-decay filter ("pred" modules, biases, norm scales excluded —
rmvd/loss/multi_scale_uni_laplace.py:58-77) selects the same tensors.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.interpolate import resize_bilinear


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


# torch kaiming_normal_(a=0.2, nonlinearity="leaky_relu") equivalent:
# std = sqrt(2 / ((1 + a^2) * fan_in)) (reference: rmvd/models/robust_mvd.py:39-55
# applies it to every conv/deconv; biases zero — flax's default bias init).
kaiming_leaky = nn.initializers.variance_scaling(
    2.0 / (1.0 + 0.2 ** 2), mode="fan_in", distribution="normal"
)


def _s2d_conv_stride2(x, kernel, bias):
    """Exact space-to-depth rewrite of a stride-2 odd-kernel conv.

    A stride-2 conv with a low-channel input (the encoder's 3-channel
    first conv) is pathological on TPU: XLA pads the 3 input channels to
    the 128-lane register width, wasting ~40x of the MXU. Rearranging the
    input into 2x2 blocks (H, W, C) -> (H/2, W/2, 4C) and scattering the
    (k, k) kernel into the equivalent (ceil((k+1)/2), ...) stride-1 kernel
    computes the identical sums (bit-differences only from f32 reduction
    order). Measured on v5e at 384x1280x3, k=7: 7.3x faster.

    Output pixel o(i,j) = sum_{dy,dx} w[dy+p, dx+p] x[2i+dy, 2j+dx] with
    p = (k-1)//2. Writing dy = 2q + r (r in {0,1}) maps each original tap
    to block row q = a + q_min of the rearranged input, so
    K4[a, b, (r_y, r_x, c)] = w[2(a + q_min) + r_y + p, ...].
    """
    k = kernel.shape[0]
    C = kernel.shape[2]
    p = (k - 1) // 2
    # block-row offsets q cover dy = 2q + r in [-p, p] for r in {0, 1}
    q_min = -((p + 1) // 2)
    q_max = p // 2
    kk = q_max - q_min + 1  # reduced kernel size

    B, H, W, _ = x.shape
    xd = (
        x.reshape(B, H // 2, 2, W // 2, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H // 2, W // 2, 4 * C)
    )

    # gather w rows/cols at dy = 2*(a + q_min) + r + p via a padded view:
    # row index ranges over [2*q_min + p, 2*q_max + 1 + p]
    lo = 2 * q_min + p
    hi = 2 * q_max + 1 + p
    pad_lo = max(0, -lo)
    pad_hi = max(0, hi - (k - 1))
    wp = jnp.pad(kernel, ((pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0), (0, 0)))
    rows = wp[lo + pad_lo : hi + pad_lo + 1]  # (2*kk, k+pads, C, F)
    rows = rows[:, lo + pad_lo : hi + pad_lo + 1]  # (2*kk, 2*kk, C, F)
    F = kernel.shape[3]
    t = rows.reshape(kk, 2, kk, 2, C, F)  # (a, ry, b, rx, c, o)
    K4 = t.transpose(0, 2, 1, 3, 4, 5).reshape(kk, kk, 4 * C, F)

    y = jax.lax.conv_general_dilated(
        xd,
        K4.astype(xd.dtype),
        window_strides=(1, 1),
        padding=((-q_min, q_max), (-q_min, q_max)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # NOTE: no preferred_element_type here — TPU convs accumulate fp32
        # on the MXU regardless and round once on a bf16 output (bit-equal
        # to f32-accumulate-then-cast), while an explicit f32 output dtype
        # breaks the conv transpose rule under autodiff with bf16 operands
        # (f32 cotangent x bf16 kernel).
    )
    return y + bias.astype(xd.dtype)


class ConvLReLU(nn.Module):
    """Conv(k, s, torch-symmetric padding) + LeakyReLU(0.2)

    (reference: rmvd/models/blocks/utils.py:14-27 `conv`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    s2d: bool = False  # stride-2 space-to-depth rewrite (see _s2d_conv_stride2)
    dtype: Any = None  # compute dtype (params stay fp32); None = input dtype

    @nn.compact
    def __call__(self, x):
        p = (self.kernel_size - 1) // 2
        if (
            self.s2d
            and self.stride == 2
            and self.kernel_size % 2 == 1
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            # identical math and identical parameter tree to the nn.Conv
            # path (kernel stays (k, k, C, F) under "conv"), so torch
            # checkpoint import and the weight-decay filter are unaffected.
            if self.dtype is not None:
                x = x.astype(self.dtype)
            x = _S2DConv(self.features, self.kernel_size, name="conv")(x)
            return leaky_relu(x)
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=True,
            kernel_init=kaiming_leaky,
            dtype=self.dtype,
            name="conv",
        )(x)
        return leaky_relu(x)


class _S2DConv(nn.Module):
    """Parameter-compatible stand-in for ``nn.Conv(k, stride 2)`` that runs

    the space-to-depth rewrite. Params are named kernel/bias with the same
    shapes as nn.Conv, so checkpoints are interchangeable."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", kaiming_leaky, (k, k, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return _s2d_conv_stride2(x, kernel, bias)


class TorchConvTranspose(nn.Module):
    """torch ``ConvTranspose2d(k, s, p)`` with exact shape/value semantics:

    input dilation by ``s``, symmetric padding ``k - 1 - p``, correlation
    with the (already spatially-flipped) kernel. Output = (H-1)*s - 2p + k.
    Kernel stored HWIO (kh, kw, I, O); torch weights (I, O, kh, kw) convert
    via ``transpose(2, 3, 0, 1)`` + spatial flip (see models/weights.py).
    The init matches torch kaiming fan-in for ConvTranspose2d (= O*kh*kw,
    i.e. "fan_out" of an HWIO kernel).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Any = None  # compute dtype (params stay fp32); None = input dtype

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                2.0 / (1.0 + 0.2**2), mode="fan_out", distribution="normal"
            ),
            (k, k, in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        cdt = self.dtype or x.dtype
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(cdt),
            kernel.astype(cdt),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            # fp32 MXU accumulation is implicit; see the s2d conv note on
            # why preferred_element_type=f32 must not be set (autodiff).
        )
        return y + bias.astype(cdt)


class DeconvLReLU(nn.Module):
    """ConvTranspose(k4, s2, p1) + LeakyReLU(0.2), output = 2x input

    (reference: dispnet_decoder.py:25-33 `deconv`)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = TorchConvTranspose(self.features, dtype=self.dtype, name="conv")(x)
        return leaky_relu(x)


def relu_and_sigmoid(x, min_val=-10.0, max_val=10.0):
    """Channel 0: ReLU; channel 1: scaled sigmoid into [min, max]

    (reference: rmvd/models/blocks/utils.py:30-45 `ReLUAndSigmoid`)."""
    rng = max_val - min_val
    c0 = nn.relu(x[..., :1])
    c1 = jax.nn.sigmoid(x[..., 1:] * (4.0 / rng)) * rng + min_val
    return jnp.concatenate([c0, c1], axis=-1)


class PredBlock(nn.Module):
    """3x3 conv -> 2 channels (invdepth, log_b) with ReLUAndSigmoid(+-10)

    (reference: dispnet_decoder.py:17-23 `pred_block`)."""

    @nn.compact
    def __call__(self, x):
        # prediction heads always run fp32: the (invdepth, log_b) outputs
        # feed depth = 1/invdepth, where bf16's ~0.4% relative error would
        # directly shift benchmark absrel/inlier metrics. Negligible compute.
        x = nn.Conv(2, kernel_size=(3, 3), padding=((1, 1), (1, 1)), kernel_init=kaiming_leaky, name="conv")(x.astype(jnp.float32))
        return relu_and_sigmoid(x, -10.0, 10.0)


class IConvBlock(nn.Module):
    """3x3 conv + LeakyReLU(0.2) on a skip concat

    (reference: dispnet_decoder.py:8-14 `iconv_block`)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, kernel_size=(3, 3), padding=((1, 1), (1, 1)), kernel_init=kaiming_leaky, dtype=self.dtype, name="conv")(x)
        return leaky_relu(x)


class DispnetEncoder(nn.Module):
    """3-conv feature encoder to 1/8 resolution, channels 64/128/256

    (reference: rmvd/models/blocks/dispnet_encoder.py:6-27)."""

    s2d: bool = False  # see _s2d_conv_stride2; isolated conv1 is 7x faster
    # with it, but measured end-to-end on v5e the surrounding layout copies
    # cost more than the conv saves (18.2 -> 20.6 ms/frame), so default off.
    dtype: Any = None

    @nn.compact
    def __call__(self, image):
        conv1 = ConvLReLU(64, kernel_size=7, stride=2, s2d=self.s2d, dtype=self.dtype, name="conv1")(image)
        conv2 = ConvLReLU(128, kernel_size=5, stride=2, dtype=self.dtype, name="conv2")(conv1)
        conv3a = ConvLReLU(256, kernel_size=3, stride=2, dtype=self.dtype, name="conv3")(conv2)
        return {"conv1": conv1, "conv2": conv2, "conv3a": conv3a}, conv3a


class DispnetContextEncoder(nn.Module):
    """1x1 conv 256 -> 32 on key features

    (reference: rmvd/models/blocks/dispnet_context_encoder.py:6-13)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, conv3):
        return ConvLReLU(32, kernel_size=1, stride=1, dtype=self.dtype, name="conv_redir")(conv3)


class LearnedFusion(nn.Module):
    """Multi-view cost fusion: per-view weight CNN + softmax across views +

    mask-weighted average (reference:
    rmvd/models/blocks/learned_fusion.py:5-54). Channel-last: corrs/masks
    are (B, V, H, W, S). The weighted sum over views is an associative
    reduction, so sharding V across chips turns this into a psum.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, corrs, masks):
        B, V, H, W, S = corrs.shape

        conv0 = nn.Conv(
            128,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=kaiming_leaky,
            dtype=self.dtype,
            name="corr_to_view_weight_conv0",
        )
        conv1 = nn.Conv(
            1, kernel_size=(1, 1), kernel_init=kaiming_leaky, dtype=self.dtype, name="corr_to_view_weight_conv1"
        )

        flat = corrs.reshape(B * V, H, W, S)
        w = conv1(nn.relu(conv0(flat))).reshape(B, V, H, W, 1)

        if V == 1:
            # single-view: pass-through (reference: learned_fusion.py:49-52);
            # the weight net is still constructed so the parameter tree is
            # independent of the number of views.
            return corrs[:, 0], masks[:, 0]

        w = jax.nn.softmax(w, axis=1) + 1e-9

        view_weights = w * masks  # (B, V, H, W, S)
        weights_sum = jnp.sum(view_weights, axis=1)  # (B, H, W, S)
        fused_mask = (weights_sum != 0).astype(corrs.dtype)
        corr_sum = jnp.sum(corrs * view_weights, axis=1)
        fused_corr = corr_sum / (weights_sum + 1e-9) * fused_mask
        return fused_corr, fused_mask


class DispnetCostvolumeEncoder(nn.Module):
    """Cost-volume encoder: context (32) + fused corr (S) -> 1/64 res, 1024 ch

    (reference: rmvd/models/blocks/dispnet_costvolume_encoder.py:7-50)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, corr, ctx):
        merged = jnp.concatenate([ctx, corr.astype(ctx.dtype)], axis=-1)
        dt = self.dtype
        conv3_1 = ConvLReLU(256, dtype=dt, name="conv3_1")(merged)
        conv4 = ConvLReLU(512, stride=2, dtype=dt, name="conv4")(conv3_1)
        conv4_1 = ConvLReLU(512, dtype=dt, name="conv4_1")(conv4)
        conv5 = ConvLReLU(512, stride=2, dtype=dt, name="conv5")(conv4_1)
        conv5_1 = ConvLReLU(512, dtype=dt, name="conv5_1")(conv5)
        conv6 = ConvLReLU(1024, stride=2, dtype=dt, name="conv6")(conv5_1)
        conv6_1 = ConvLReLU(1024, dtype=dt, name="conv6_1")(conv6)
        all_enc = {
            "merged": merged,
            "conv3_1": conv3_1,
            "conv4": conv4,
            "conv4_1": conv4_1,
            "conv5": conv5,
            "conv5_1": conv5_1,
            "conv6": conv6,
            "conv6_1": conv6_1,
        }
        return all_enc, conv6_1


class DispnetDecoder(nn.Module):
    """6-scale decoder: deconv x2, skip-concat, per-scale (invdepth, log_b)

    prediction heads (reference: rmvd/models/blocks/dispnet_decoder.py:37-138).
    Upsampled predictions are detached before re-injection, exactly like the
    reference (:88-121 `.detach()`).
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, enc_fused, all_enc):
        preds = {}
        dt = self.dtype

        def add_outputs(pred):
            # reference: dispnet_decoder.py:126-138
            mean = pred[..., 0:1]
            log_b = pred[..., 1:2]
            b = jnp.exp(log_b)
            ent = jnp.log(2 * b + 1e-4) + 1
            preds.setdefault("invdepth_uncertainties_all", []).append(ent)
            preds.setdefault("invdepth_log_bs_all", []).append(log_b)
            preds.setdefault("invdepths_all", []).append(mean)
            preds["invdepth_uncertainty"] = ent
            preds["invdepth_log_b"] = log_b
            preds["invdepth"] = mean

        def upsample_detached(pred, like):
            target = like.shape[1:3]
            # preds are fp32 (see PredBlock); cast to the skip features'
            # compute dtype for the concat
            return jax.lax.stop_gradient(resize_bilinear(pred, target)).astype(like.dtype)

        pred_0 = PredBlock(name="pred_0")(enc_fused)
        add_outputs(pred_0)

        deconv_1 = DeconvLReLU(512, dtype=dt, name="deconv_1")(enc_fused)
        rfeat1 = IConvBlock(512, dtype=dt, name="rfeat1")(
            jnp.concatenate(
                [all_enc["conv5_1"], deconv_1, upsample_detached(pred_0, deconv_1)], -1
            )
        )
        pred_1 = PredBlock(name="pred_1")(rfeat1)
        add_outputs(pred_1)

        deconv_2 = DeconvLReLU(256, dtype=dt, name="deconv_2")(rfeat1)
        rfeat2 = IConvBlock(256, dtype=dt, name="rfeat2")(
            jnp.concatenate(
                [all_enc["conv4_1"], deconv_2, upsample_detached(pred_1, deconv_2)], -1
            )
        )
        pred_2 = PredBlock(name="pred_2")(rfeat2)
        add_outputs(pred_2)

        deconv_3 = DeconvLReLU(128, dtype=dt, name="deconv_3")(rfeat2)
        rfeat3 = IConvBlock(128, dtype=dt, name="rfeat3")(
            jnp.concatenate(
                [all_enc["conv3_1"], deconv_3, upsample_detached(pred_2, deconv_3)], -1
            )
        )
        pred_3 = PredBlock(name="pred_3")(rfeat3)
        add_outputs(pred_3)

        deconv_4 = DeconvLReLU(64, dtype=dt, name="deconv_4")(rfeat3)
        rfeat4 = IConvBlock(64, dtype=dt, name="rfeat4")(
            jnp.concatenate(
                [all_enc["conv2"], deconv_4, upsample_detached(pred_3, deconv_4)], -1
            )
        )
        pred_4 = PredBlock(name="pred_4")(rfeat4)
        add_outputs(pred_4)

        deconv_5 = DeconvLReLU(32, dtype=dt, name="deconv_5")(rfeat4)
        rfeat5 = IConvBlock(32, dtype=dt, name="rfeat5")(
            jnp.concatenate(
                [all_enc["conv1"], deconv_5, upsample_detached(pred_4, deconv_5)], -1
            )
        )
        pred_5 = PredBlock(name="pred_5")(rfeat5)
        add_outputs(pred_5)

        return preds
