"""Lane-packed 3D convolution for small-channel volumes.

The MVSNet-family cost regularizers are 3D U-Nets over (B, D, H, W, C)
volumes with C = 8..64 (reference: rmvd/models/blocks/mvsnet_components.py
:25-41, 69-123). On TPU the channel dim maps to the 128-wide lane
dimension, so XLA's direct conv runs with 2-16x lane padding on BOTH
matmul operands and the regularizers measure <1% MFU (PARITY.md family
note) — lane-bound, not FLOP- or HBM-bound.

This module reformulates the k=3, stride-1, pad-1 conv as a dot_general
whose output lanes are W-PACKED: a spatial tile of T output columns and
all Cout channels live together in the lane dim (T*Cout lanes), so every
output lane is useful. Two packings:

- block-diagonal ("packed"): 27 pre-shifted packed views of the input,
  contracted with (27, T*Cin, T*Cout) block-diagonal tap matrices. K
  density 1/T.
- banded ("banded"): overlapping (T+2)-column windows and 9 (dz, dy)
  taps; the three x-taps become a banded ((T+2)*Cin, T*Cout) matrix. K
  density 3/(T+2) — ~3x denser than block-diagonal for the same T.

The tap matrices are formed from the dense (3,3,3,Cin,Cout) kernel at
apply time with Kronecker products against constant selection masks —
O(T^2*Cin*Cout) work, trivial next to the conv — so parameters, their
names, and checkpoints are IDENTICAL to the nn.Conv path and torch weight
conversion is unchanged.

Numerics: the dot_general accumulates in fp32 (preferred_element_type),
matching the MXU's native single-pass conv accumulation; the packed paths
are exact reorderings of the same sums (fp32 parity ~1e-6, tested against
the lax.conv oracle in tests/test_conv3d_packed.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# Empirical best banded tiles on TPU v5e at the CostRegNet volume shapes
# (tools/bench_conv3d_strategies.py, bf16, D=256 volume): C=8 layers run
# fastest at T=6 (8->8: 1.14 ms vs 2.79 xla; 8->1: 1.12 vs 2.75), C=16 at
# T=14 (0.43 vs 0.65), C>=32 at T=6 (conv4 0.36 vs 0.46). Lane-math
# defaults (128/max(C)) measured SLOWER than these.
_BEST_TILE = {8: 6, 16: 14, 32: 6, 64: 6}


def _tile_for(cin: int, cout: int, width: int) -> int:
    """Default spatial tile (measured table, lane-fill fallback)."""
    c = max(cin, cout)
    t = _BEST_TILE.get(c, max(1, 128 // c))
    return min(t, width)


def _kron_eye(kernel, tile):
    """(3,3,3,Ci,Co) -> (27, T*Ci, T*Co) block-diagonal tap matrices."""
    k = kernel.reshape(27, kernel.shape[3], kernel.shape[4])
    eye = jnp.eye(tile, dtype=kernel.dtype)
    # kron(eye, k[tap]) for every tap at once
    return (eye[None, :, None, :, None] * k[:, None, :, None, :]).reshape(
        27, tile * kernel.shape[3], tile * kernel.shape[4]
    )


def _band_masks(tile: int) -> np.ndarray:
    """Constant (3, T+2, T) selectors: E[dx, t+dx, t] = 1."""
    E = np.zeros((3, tile + 2, tile), np.float32)
    for dx in range(3):
        for t in range(tile):
            E[dx, t + dx, t] = 1.0
    return E


def _kron_band(kernel, tile):
    """(3,3,3,Ci,Co) -> (9, (T+2)*Ci, T*Co) banded tap matrices."""
    ci, co = kernel.shape[3], kernel.shape[4]
    E = jnp.asarray(_band_masks(tile), kernel.dtype)  # (3, T+2, T)
    # M[dzdy] = sum_dx kron(E[dx], kernel[dz,dy,dx])
    k = kernel.reshape(9, 3, ci, co)  # (dzdy, dx, ci, co)
    M = jnp.einsum("xjt,gxio->gjito", E, k, optimize=True)
    return M.reshape(9, (tile + 2) * ci, tile * co)


def _band_masks_s2(tile: int) -> np.ndarray:
    """Constant (3, 2T+2, T) selectors for stride-2: E[dx, 2t+dx, t] = 1."""
    E = np.zeros((3, 2 * tile + 2, tile), np.float32)
    for dx in range(3):
        for t in range(tile):
            E[dx, 2 * t + dx, t] = 1.0
    return E


def _kron_band_s2(kernel, tile):
    """(3,3,3,Ci,Co) -> (9, (2T+2)*Ci, T*Co) stride-2 banded matrices."""
    ci, co = kernel.shape[3], kernel.shape[4]
    E = jnp.asarray(_band_masks_s2(tile), kernel.dtype)  # (3, 2T+2, T)
    k = kernel.reshape(9, 3, ci, co)
    M = jnp.einsum("xjt,gxio->gjito", E, k, optimize=True)
    return M.reshape(9, (2 * tile + 2) * ci, tile * co)


def conv3d_packed_s2(x, kernel, *, tile=None):
    """k=3 / stride-2 / pad-1 3D conv, NDHWC, via the banded packing.

    Exact reordering of ``lax.conv_general_dilated(x, kernel, (2,2,2),
    ((1,1),)*3, NDHWC/DHWIO)``: the three x-taps become a stride-2 banded
    ((2T+2)*Cin, T*Cout) matrix over overlapping (2T+2)-column windows,
    and the nine (dz, dy) taps select stride-2 row slices.
    """
    B, D, H, W, C = x.shape
    Co = kernel.shape[-1]
    Do, Ho, Wo = (D + 1) // 2, (H + 1) // 2, (W + 1) // 2
    T = tile or max(1, min(_tile_for(C, Co, Wo), Wo))
    Wop = -(-Wo // T) * T
    Wt = Wop // T
    # padded input width must cover the last window: 2*(Wt-1)*T + 2T+2
    need_w = 2 * Wop + 2
    need_d = 2 * Do + 1
    need_h = 2 * Ho + 1
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (1, max(0, need_d - D - 1)),
            (1, max(0, need_h - H - 1)),
            (1, max(0, need_w - W - 1)),
            (0, 0),
        ),
    )

    M = _kron_band_s2(kernel, tile=T).astype(x.dtype)
    wins = jnp.stack(
        [
            xp[:, :, :, 2 * i * T : 2 * i * T + 2 * T + 2, :].reshape(
                xp.shape[0], xp.shape[1], xp.shape[2], (2 * T + 2) * C
            )
            for i in range(Wt)
        ],
        axis=-2,
    )  # (B, Dp, Hp, Wt, (2T+2)*C)
    lhs = jnp.stack(
        [
            wins[:, dz : dz + 2 * Do - 1 : 2, dy : dy + 2 * Ho - 1 : 2]
            for dz in range(3)
            for dy in range(3)
        ],
        axis=-2,
    )  # (B, Do, Ho, Wt, 9, (2T+2)*C)
    out = jax.lax.dot_general(
        lhs, M, (((4, 5), (0, 1)), ((), ())), preferred_element_type=jnp.float32
    )
    out = out.reshape(B, Do, Ho, Wop, Co)[:, :, :, :Wo]
    return out.astype(x.dtype)


def conv3d_packed(x, kernel, *, tile=None, banded=True):
    """k=3 / stride-1 / pad-1 3D conv, NDHWC, via lane-packed dot_general.

    Exact reordering of ``lax.conv_general_dilated(x, kernel, (1,1,1),
    ((1,1),)*3, NDHWC/DHWIO)`` with fp32 accumulation.

    Args:
      x: (B, D, H, W, Cin).
      kernel: (3, 3, 3, Cin, Cout).
      tile: output columns packed per lane group (default: 128/max(C)).
      banded: use the banded windows (denser contraction) instead of the
        block-diagonal packing.
    """
    B, D, H, W, C = x.shape
    Co = kernel.shape[-1]
    T = tile or _tile_for(C, Co, W)
    Wp = -(-W // T) * T
    Wt = Wp // T
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1 + Wp - W), (0, 0)))

    if banded:
        M = _kron_band(kernel, tile=T).astype(x.dtype)
        wins = jnp.stack(
            [
                xp[:, :, :, i * T : i * T + T + 2, :].reshape(
                    B, D + 2, H + 2, (T + 2) * C
                )
                for i in range(Wt)
            ],
            axis=-2,
        )  # (B, D+2, H+2, Wt, (T+2)*C)
        lhs = jnp.stack(
            [wins[:, dz : dz + D, dy : dy + H] for dz in range(3) for dy in range(3)],
            axis=-2,
        )  # (B, D, H, Wt, 9, (T+2)*C)
    else:
        M = _kron_eye(kernel, tile=T).astype(x.dtype)
        lhs = jnp.stack(
            [
                xp[:, dz : dz + D, dy : dy + H, dx : dx + Wp, :].reshape(
                    B, D, H, Wt, T * C
                )
                for dz in range(3)
                for dy in range(3)
                for dx in range(3)
            ],
            axis=-2,
        )  # (B, D, H, Wt, 27, T*C)

    out = jax.lax.dot_general(
        lhs, M, (((4, 5), (0, 1)), ((), ())), preferred_element_type=jnp.float32
    )
    out = out.reshape(B, D, H, Wp, Co)[:, :, :, :W]
    return out.astype(x.dtype)


class Conv3dPackedS2(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3,3), strides=2, padding=1)``.

    Same parameter tree as nn.Conv. Measured on v5e: wins 1.6x over the
    direct strided conv for Cin=8 at full-res volumes (conv1: 1.74 ->
    1.09 ms, tile 14), ties/regresses for Cin>=16 — callers gate on Cin.
    """

    features: int
    use_bias: bool = False
    dtype: object = jnp.float32
    tile: int | None = 14

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, x.shape[-1], self.features),
        )
        y = conv3d_packed_s2(
            x.astype(self.dtype), kernel.astype(self.dtype), tile=self.tile
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Conv3dPacked(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3,3), padding=1)`` on NDHWC input.

    Same parameter names/shapes ("kernel", optional "bias") and
    initializers as flax's nn.Conv, so checkpoints and the torch weight
    converter are oblivious to which implementation a model uses.
    """

    features: int
    use_bias: bool = True
    dtype: object = jnp.float32
    tile: int | None = None
    banded: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, x.shape[-1], self.features),
        )
        y = conv3d_packed(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            tile=self.tile,
            banded=self.banded,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def conv3d_op(features, *, use_bias, dtype, name, impl="xla", tile=None):
    """Factory: the family blocks pick their 3x3x3 stride-1 conv impl here.

    impl='xla' keeps flax nn.Conv (direct lowering); impl='packed'/'banded'
    returns the lane-packed module with identical parameters.
    """
    if impl not in ("xla", "banded", "packed", "dz2d"):
        raise ValueError(
            f"unknown conv3d impl {impl!r}: "
            "expected one of 'xla', 'banded', 'packed', 'dz2d'"
        )
    if impl == "dz2d":
        return Conv3dDz2d(
            features, stride=1, use_bias=use_bias, dtype=dtype, name=name
        )
    if impl == "xla":
        return nn.Conv(
            features,
            kernel_size=(3, 3, 3),
            padding=((1, 1), (1, 1), (1, 1)),
            use_bias=use_bias,
            dtype=dtype,
            name=name,
        )
    return Conv3dPacked(
        features,
        use_bias=use_bias,
        dtype=dtype,
        tile=tile,
        banded=(impl == "banded"),
        name=name,
    )


# ---------------------------------------------------------------------------
# dz-decomposed lowerings: XLA's TPU *3D* conv emitter measures 4-5x slower
# than summing three D-shifted *2D* convs for the CostRegNet shapes
# (conv0 (1,256,64,80,32)->8: 13.9 ms direct vs 3.1 ms decomposed, v5e
# bf16; tools/bench_costreg_layers.py). The decomposition is an exact
# reordering of the same fp32-accumulated sums: (B,D) fold into the 2D
# batch, and the three dz taps become three 2D convs on D-shifted views.
# ---------------------------------------------------------------------------


def conv3d_dz2d(x, kernel, *, stride=1):
    """k=3 / pad-1 NDHWC 3D conv as three D-shifted NHWC 2D convs.

    Exact reordering of ``lax.conv_general_dilated(x, kernel,
    (stride,)*3, ((1,1),)*3, NDHWC/DHWIO)`` with fp32 accumulation.
    ``stride`` in {1, 2} applies to all three spatial dims.
    """
    B, D, H, W, C = x.shape
    Co = kernel.shape[-1]
    if stride == 1:
        Do = D
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        slices = [xp[:, dz : dz + D] for dz in range(3)]
        strides_2d = (1, 1)
    else:
        Do = (D + 1) // 2
        # out[do] = sum_dz in[2*do + dz - 1]
        need = 2 * Do + 1
        xp = jnp.pad(x, ((0, 0), (1, max(0, need - D - 1)), (0, 0), (0, 0), (0, 0)))
        slices = [xp[:, dz : dz + 2 * Do - 1 : 2] for dz in range(3)]
        strides_2d = (2, 2)

    # per-conv outputs stay in the operand dtype (a conv with fp32
    # preferred_element_type over bf16 operands breaks jax's conv VJP with
    # a dtype mismatch); the cross-partial sum accumulates in fp32
    acc = None
    for dz in range(3):
        xs = slices[dz].reshape(B * Do, H, W, C)
        o = jax.lax.conv_general_dilated(
            xs,
            kernel[dz],
            window_strides=strides_2d,
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
        acc = o if acc is None else acc + o
    Ho, Wo = acc.shape[1], acc.shape[2]
    return acc.reshape(B, Do, Ho, Wo, Co).astype(x.dtype)


def conv3d_transposed_dz2d(x, kernel, *, stride=2, output_padding=1):
    """torch ConvTranspose3d(k=3, pad=1) as interleaved 2D transposed convs.

    Exact reordering of the lax transposed form (lhs_dilation=stride) used
    by the family decoders: even output planes take the dz=1 tap, odd
    planes sum dz=0 of the next input plane and dz=2 of the current one.
    For stride=1 this is the plain dz decomposition with the flipped-tap
    correspondence of a transposed conv.
    """
    B, D, H, W, C = x.shape
    k = 3
    Co = kernel.shape[-1]
    pad_lo = k - 2  # 1
    pad_hi = k - 2 + output_padding

    def t2d(xs, ktap):
        # operand-dtype output (see conv3d_dz2d: fp32 preferred output over
        # bf16 operands breaks the conv VJP); fp32 cross-tap accumulation
        return jax.lax.conv_general_dilated(
            xs.reshape(-1, H, W, C),
            ktap,
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)

    if stride == 1:
        Do = D + output_padding
        xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)))
        acc = None
        for dz in range(3):
            o = t2d(xp[:, dz : dz + Do], kernel[dz])
            acc = o if acc is None else acc + o
        Ho, Wo = acc.shape[1], acc.shape[2]
        return acc.reshape(B, Do, Ho, Wo, Co).astype(x.dtype)

    assert stride == 2
    Do = 2 * D - 1 + output_padding
    # out[2m]   = t2d(x[m], K[1])
    # out[2m+1] = t2d(x[m], K[0]) + t2d(x[m+1], K[2])   (x[D] = 0)
    even = t2d(x, kernel[1])  # (B*D, Ho, Wo, Co)
    xnext = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    odd = t2d(x, kernel[0]) + t2d(xnext, kernel[2])
    Ho, Wo = even.shape[1], even.shape[2]
    even = even.reshape(B, D, Ho, Wo, Co)
    odd = odd.reshape(B, D, Ho, Wo, Co)
    inter = jnp.stack([even, odd], axis=2).reshape(B, 2 * D, Ho, Wo, Co)
    return inter[:, :Do].astype(x.dtype)


class Conv3dDz2d(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3,3), strides, padding=1)``.

    Same parameter tree ("kernel", optional "bias") and initializers as
    flax's nn.Conv; lowers through :func:`conv3d_dz2d` (three D-shifted 2D
    convs — 4-6x the direct 3D emitter on v5e for the family shapes).
    """

    features: int
    stride: int = 1
    use_bias: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, x.shape[-1], self.features),
        )
        y = conv3d_dz2d(
            x.astype(self.dtype), kernel.astype(self.dtype), stride=self.stride
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y
