"""Fused plane-sweep score sampling, v2 — MXU-blocked Pallas kernel.

Same math as ops/corr.py's separable two-hot sampling (and as v1 in
planesweep_sample.py): per key pixel p with an (Hs, Ws) score image,

    out[p, s] = ry[p, s] . (score_image_p @ rx[p, s])

with ry/rx the two-hot bilinear row/column weight vectors. v1 processed
8 pixels per program with the score image in f32; v2:

- stores the score volume in bf16 (the XLA path's dot already consumes
  it at bf16 under DEFAULT precision, so this matches the baseline's
  effective precision on TPU),
- runs 64 pixels per program so the (S, Hs) x (Hs, Ws) per-pixel MXU
  dots pipeline across a long fori_loop,
- builds the two-hot weights in f32 on the VPU and casts to bf16 only
  at the dot inputs; the dot accumulates in f32 (preferred_element_type),
- keeps the x-contraction as an f32 VPU multiply-reduce.

HBM traffic per view is one bf16 stream of the score volume plus the
(P, S) coordinates and output — the XLA scan re-reads the score volume
once per hypothesis slab and pays its dense dot at ~6.6 TFLOP/s
effective (measured v5e; see corr.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(TP, S, Hs, Ws, corr_ref, y0_ref, wy_ref, x0_ref, wx_ref, out_ref):
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (S, Hs), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (S, Ws), 1)

    def body(p, _):
        y0 = y0_ref[p, :].reshape(S, 1)
        wy = wy_ref[p, :].reshape(S, 1)
        x0 = x0_ref[p, :].reshape(S, 1)
        wx = wx_ref[p, :].reshape(S, 1)

        ry = jnp.where(iota_h == y0, 1.0 - wy, 0.0) + jnp.where(
            iota_h == y0 + 1, wy, 0.0
        )  # (S, Hs) f32
        m = jnp.dot(
            ry.astype(jnp.bfloat16),
            corr_ref[p],
            preferred_element_type=jnp.float32,
        )  # (S, Ws) f32
        rx = jnp.where(iota_w == x0, 1.0 - wx, 0.0) + jnp.where(
            iota_w == x0 + 1, wx, 0.0
        )  # (S, Ws) f32
        out_ref[p, :] = jnp.sum(m * rx, axis=1)
        return _

    jax.lax.fori_loop(0, TP, body, None)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def planesweep_sample_v2(corr_img, y0, wy, x0, wx, tile=64, interpret=None):
    """Sample per-hypothesis bilinear scores from per-pixel score images.

    Args:
        corr_img: (P, Hs, Ws) float32 or bfloat16 per-pixel score images
            (cast to bfloat16 internally).
        y0, x0: (P, S) int32 top-left tap indices (out-of-range rows /
            columns match no iota position and contribute 0 = zeros pad).
        wy, wx: (P, S) float32 fractional weights.
        tile: pixels per program.

    Returns:
        (P, S) float32 sampled scores (visibility/in-bounds masking is
        applied by the caller, see corr.py::_finish_corr).
    """
    P, Hs, Ws = corr_img.shape
    S = y0.shape[1]

    corr_img = corr_img.astype(jnp.bfloat16)

    pad = (-P) % tile
    if pad:
        corr_img = jnp.pad(corr_img, ((0, pad), (0, 0), (0, 0)))
        y0 = jnp.pad(y0, ((0, pad), (0, 0)), constant_values=-10)
        x0 = jnp.pad(x0, ((0, pad), (0, 0)), constant_values=-10)
        wy = jnp.pad(wy, ((0, pad), (0, 0)))
        wx = jnp.pad(wx, ((0, pad), (0, 0)))
    Pp = P + pad

    if interpret is None:
        default_dev = jax.config.jax_default_device
        platform = (
            default_dev.platform if default_dev is not None else jax.default_backend()
        )
        interpret = platform != "tpu"

    grid = (Pp // tile,)
    out = pl.pallas_call(
        functools.partial(_kernel, tile, S, Hs, Ws),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, Hs, Ws), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, S), jnp.float32),
        interpret=interpret,
    )(corr_img, y0, wy, x0, wx)

    return out[:P]
