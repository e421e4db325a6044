"""Fused plane-sweep score sampling — the flagship Pallas kernel.

Takes the all-pairs score volume (per key pixel, an (Hs, Ws) score image)
and evaluates the S per-hypothesis bilinear samples using the separable
two-hot formulation (see robustmvd_tpu/ops/corr.py): per pixel,

    out[s] = ry[s] . (score_image @ rx[s])

with ry/rx built from iota comparisons in registers. The XLA version
materializes the (P, S, Hs) row weights and the (P, S, Ws) partial products
in HBM (~6 GB of traffic per KITTI-sized view); this kernel keeps both in
VMEM — the only HBM traffic is streaming the score volume once and writing
the (P, S) output.

Grid: one program per tile of TP key pixels; each program loops its pixels,
building the (S, Hs) two-hot row matrix, contracting it with the pixel's
(Hs, Ws) score image on the MXU, and reducing against the (S, Ws) two-hot
column matrix on the VPU.
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
        )  # (S, Hs)
        m = jnp.dot(ry, corr_ref[p], preferred_element_type=jnp.float32)  # (S, Ws)
        rx = jnp.where(iota_w == x0, 1.0 - wx, 0.0) + jnp.where(
            iota_w == x0 + 1, wx, 0.0
        )  # (S, Ws)
        out_ref[p, :] = jnp.sum(m * rx, axis=1)
        return _

    jax.lax.fori_loop(0, TP, body, None)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def planesweep_sample(corr_img, y0, wy, x0, wx, tile=8, interpret=None):
    """Sample per-hypothesis bilinear scores from per-pixel score images.

    Args:
        corr_img: (P, Hs, Ws) float32 — per key pixel score images.
        y0, x0: (P, S) int32 top-left tap indices (may be out of range —
            out-of-range rows/columns match no position and contribute 0,
            i.e. zeros padding).
        wy, wx: (P, S) float32 fractional weights.
        tile: pixels per program.

    Returns:
        (P, S) float32 sampled scores (unmasked; visibility/in-bounds
        masking is applied by the caller).
    """
    P, Hs, Ws = corr_img.shape
    S = y0.shape[1]

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
