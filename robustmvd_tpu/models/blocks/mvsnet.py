"""MVSNet components in flax (NHWC / NDHWC).

Reference parity (rmvd/models/blocks/mvsnet_components.py:8-123):
``FeatureNet`` (2D CNN, 3->32ch at 1/4 res) and ``CostRegNet`` (3D-CNN
U-Net hourglass over the (B, D, h, w, C) variance volume with BN+ReLU and
transposed-conv up path). 3D convs run channel-last through XLA's
conv_general_dilated, which tiles them onto the MXU.

Mixed precision: every block takes ``dtype`` — bf16 runs the convs on the
MXU's native single-pass path with fp32 params (flax param_dtype default)
and fp32 BatchNorm statistics (flax computes BN stats with
force_float32_reductions regardless of activation dtype), the robust_mvd
template applied to the family.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.conv3d import conv3d_op


class ConvBnReLU(nn.Module):
    """Conv2d(bias=False) + BN + ReLU (reference: mvsnet_components.py:8-22)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ConvBnReLU3D(nn.Module):
    """Conv3d(bias=False) + BN + ReLU (reference: mvsnet_components.py:25-41).

    Input (B, D, H, W, C). ``conv3d_impl`` selects the stride-1 conv
    lowering: "xla" (direct) or "banded"/"packed" (lane-packed dot, see
    ops/conv3d.py) — parameters are identical either way."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dtype: object = jnp.float32
    conv3d_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train=False):
        k, s, p = self.kernel_size, self.stride, self.pad
        if k == 3 and s == 1 and p == 1:
            conv = conv3d_op(
                self.features,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
                impl=self.conv3d_impl,
            )
        elif k == 3 and s == 2 and p == 1 and self.conv3d_impl == "dz2d":
            from ...ops.conv3d import Conv3dDz2d

            conv = Conv3dDz2d(
                self.features, stride=2, use_bias=False, dtype=self.dtype,
                name="conv",
            )
        elif (
            k == 3 and s == 2 and p == 1
            and self.conv3d_impl != "xla" and x.shape[-1] == 8
        ):
            # stride-2 banded packing wins only at Cin=8 (ops/conv3d.py)
            from ...ops.conv3d import Conv3dPackedS2

            conv = Conv3dPackedS2(
                self.features, use_bias=False, dtype=self.dtype, name="conv"
            )
        else:
            conv = nn.Conv(
                self.features,
                kernel_size=(k, k, k),
                strides=(s, s, s),
                padding=((p, p), (p, p), (p, p)),
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )
        x = conv(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class TorchConvTranspose3d(nn.Module):
    """torch ConvTranspose3d(k3, s2, p1, output_padding=1, bias=False):

    out = 2*in on each spatial dim. Input-dilated correlation with
    asymmetric high-side padding for the output_padding."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, mode="fan_out", distribution="normal"),
            (k, k, k, in_features, self.features),
        )
        if k == 3 and self.padding == 1:
            # dz-decomposed lowering: XLA's 3D transposed-conv emitter is
            # ~4x slower than interleaved 2D convs (ops/conv3d.py)
            from ...ops.conv3d import conv3d_transposed_dz2d

            return conv3d_transposed_dz2d(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                stride=self.stride,
                output_padding=self.output_padding,
            )
        pad_lo = k - 1 - self.padding
        pad_hi = k - 1 - self.padding + self.output_padding
        pads = ((pad_lo, pad_hi),) * 3
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=pads,
            lhs_dilation=(self.stride,) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )


class DeconvBnReLU3D(nn.Module):
    features: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = TorchConvTranspose3d(self.features, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class FeatureNet(nn.Module):
    """2D feature extractor: 3 -> 32 channels at 1/4 resolution

    (reference: mvsnet_components.py:44-66)."""

    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        dt = self.dtype
        x = ConvBnReLU(8, 3, 1, 1, dtype=dt, name="conv0")(x, train)
        x = ConvBnReLU(8, 3, 1, 1, dtype=dt, name="conv1")(x, train)
        x = ConvBnReLU(16, 5, 2, 2, dtype=dt, name="conv2")(x, train)
        x = ConvBnReLU(16, 3, 1, 1, dtype=dt, name="conv3")(x, train)
        x = ConvBnReLU(16, 3, 1, 1, dtype=dt, name="conv4")(x, train)
        x = ConvBnReLU(32, 5, 2, 2, dtype=dt, name="conv5")(x, train)
        x = ConvBnReLU(32, 3, 1, 1, dtype=dt, name="conv6")(x, train)
        x = nn.Conv(32, kernel_size=(3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="feature")(x)
        return x


class CostRegNet(nn.Module):
    """3D U-Net cost regularizer -> 1-channel logits

    (reference: mvsnet_components.py:69-123). Input (B, D, h, w, 32)."""

    dtype: object = jnp.float32
    conv3d_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train=False):
        dt = self.dtype
        impl = self.conv3d_impl
        # dz2d (three D-shifted 2D convs) wins on EVERY layer incl. conv0
        # (4.8 -> 0.85 ms) and the strided/transposed ones; the banded
        # packings only ever beat the direct 3D emitter, which the 2D
        # decomposition sidesteps entirely (tools/bench_costreg_layers.py)
        conv0 = ConvBnReLU3D(8, dtype=dt, conv3d_impl=("dz2d" if impl == "dz2d" else "xla"), name="conv0")(x, train)
        conv2 = ConvBnReLU3D(16, dtype=dt, conv3d_impl=impl, name="conv2")(
            ConvBnReLU3D(16, stride=2, dtype=dt, conv3d_impl=impl, name="conv1")(
                conv0, train
            ),
            train,
        )
        conv4 = ConvBnReLU3D(32, dtype=dt, conv3d_impl=impl, name="conv4")(
            ConvBnReLU3D(32, stride=2, dtype=dt, conv3d_impl=impl, name="conv3")(conv2, train), train
        )
        x = ConvBnReLU3D(64, dtype=dt, conv3d_impl=impl, name="conv6")(
            ConvBnReLU3D(64, stride=2, dtype=dt, conv3d_impl=impl, name="conv5")(conv4, train), train
        )
        x = conv4 + DeconvBnReLU3D(32, dtype=dt, name="conv7")(x, train)
        x = conv2 + DeconvBnReLU3D(16, dtype=dt, name="conv9")(x, train)
        x = conv0 + DeconvBnReLU3D(8, dtype=dt, name="conv11")(x, train)
        # prediction head in fp32 (the robust_mvd template keeps heads full
        # precision; the softmax downstream is fp32 regardless)
        x = conv3d_op(1, use_bias=True, dtype=jnp.float32, name="prob", impl=impl)(
            x.astype(jnp.float32)
        )
        return x
