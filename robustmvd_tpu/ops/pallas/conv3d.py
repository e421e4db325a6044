"""Banded lane-packed 3D conv as a Pallas TPU kernel.

The XLA banded formulation (ops/conv3d.py) is bound by HBM: the stacked
(9, (T+2)*Cin) window operand materializes ~9x the volume in HBM before
the dot reads it back. This kernel forms the banded operands in VMEM
instead: each program loads one (BD+2, H+2, (Wp+2)*C) halo block of the
volume (lane dim = packed w*channels), builds the nine (dz, dy)-shifted
banded row-blocks in registers, and accumulates nine MXU dots against the
(9, (T+2)*Cin, T*Cout) tap matrices — the volume crosses HBM exactly
twice (read once via the two shifted block inputs, output written once).

Semantics match ``lax.conv_general_dilated(x, k, (1,1,1), ((1,1),)*3,
NDHWC/DHWIO)`` with fp32 accumulation (oracle-tested in
tests/test_conv3d_pallas.py). Forward-only kernel; the custom VJP falls
back to the XLA banded path for gradients.

Reference behavior being accelerated: the MVSNet-family 3D regularizers
(rmvd/models/blocks/mvsnet_components.py:25-41, 69-123).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..conv3d import _kron_band, conv3d_packed


def _kernel(BD, H, Wt, T, C, Co, x_lo_ref, x_hi_ref, m_ref, out_ref):
    # halo block: BD rows + first 2 rows of the next block
    xfull = jnp.concatenate([x_lo_ref[0], x_hi_ref[0, :2]], axis=0)
    # (BD+2, H+2, (Wp+2)*C)

    # Mosaic layout rule: every reshape that merges dims into the lane
    # dimension needs that lane dim to be a 128-multiple — the window
    # width (T+2)*C is chosen so by _tile_for_pallas, and the output
    # stays 4D (lanes T*Co untouched; the caller does the final merge).
    acc = jnp.zeros((BD * H * Wt, T * Co), jnp.float32)
    for dz in range(3):
        for dy in range(3):
            rows = xfull[dz : dz + BD, dy : dy + H, :]  # (BD, H, L)
            # banded windows along the packed w*channel lanes
            lhs = jnp.stack(
                [
                    rows[:, :, i * T * C : (i * T + T + 2) * C]
                    for i in range(Wt)
                ],
                axis=2,
            ).reshape(BD * H * Wt, (T + 2) * C)
            acc = acc + jax.lax.dot_general(
                lhs,
                m_ref[dz * 3 + dy],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = acc.reshape(BD, H, Wt, T * Co).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile", "block_d", "interpret")
)
def _conv3d_banded_pallas(x, kernel, tile, block_d, interpret):
    B, D, H, W, C = x.shape
    Co = kernel.shape[-1]
    T = tile
    BD = block_d
    Wp = -(-W // T) * T
    Wt = Wp // T
    nD = -(-D // BD)
    Dp = nD * BD

    # pad: +1 halo on every spatial dim; w additionally to the tile grid;
    # d additionally by one full block so the shifted x_hi block input is
    # always in range (the extra rows are zeros and are never emitted)
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (1, 1 + (Dp - D) + BD),
            (1, 1),
            (1, 1 + (Wp - W)),
            (0, 0),
        ),
    )
    L = (Wp + 2) * C
    xp = xp.reshape(B, Dp + 2 + BD, H + 2, L)

    M = _kron_band(kernel, tile=T).astype(x.dtype)  # (9, (T+2)C, T*Co)

    if interpret is None:
        default_dev = jax.config.jax_default_device
        platform = (
            default_dev.platform if default_dev is not None else jax.default_backend()
        )
        interpret = platform != "tpu"

    out = pl.pallas_call(
        functools.partial(_kernel, BD, H, Wt, T, C, Co),
        grid=(B, nD),
        in_specs=[
            pl.BlockSpec(
                (1, BD, H + 2, L), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BD, H + 2, L), lambda b, i: (b, i + 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (9, (T + 2) * C, T * Co), lambda b, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, BD, H, Wt, T * Co), lambda b, i: (b, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Dp, H, Wt, T * Co), x.dtype),
        interpret=interpret,
    )(xp, xp, M)

    return out[:, :D].reshape(B, D, H, Wp, Co)[:, :, :, :W]


def _tile_for_pallas(c: int, co: int, width: int) -> int:
    """Default tile: the smallest T with (T+2)*c a 128-multiple.

    Mosaic's vector layouts only support the in-kernel window reshape
    when the window width is lane-aligned: C=8 -> T=14 (window 128),
    C=16 -> T=6 (128), C=32 -> T=6 (256), C=64 -> T=6 (512)."""
    if c >= 1 and 128 % c == 0 and 128 // c > 2:
        t = 128 // c - 2
        if t < 4:  # wider window, fewer tiles
            t = 256 // c - 2
    else:
        t = 6
    return max(1, min(t, width))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3d_banded_pallas(x, kernel, tile=None, block_d=4, interpret=None):
    """k=3 / stride-1 / pad-1 NDHWC conv via the Pallas banded kernel.

    Forward runs the Mosaic kernel on TPU (interpreter elsewhere);
    backward differentiates the equivalent XLA banded formulation.
    """
    T = tile or _tile_for_pallas(x.shape[-1], kernel.shape[-1], x.shape[-2])
    return _conv3d_banded_pallas(x, kernel, T, block_d, interpret)


def _fwd(x, kernel, tile, block_d, interpret):
    return conv3d_banded_pallas(x, kernel, tile, block_d, interpret), (x, kernel)


def _bwd(tile, block_d, interpret, res, g):
    x, kernel = res
    _, vjp = jax.vjp(lambda xx, kk: conv3d_packed(xx, kk, banded=True), x, kernel)
    return vjp(g)


conv3d_banded_pallas.defvjp(_fwd, _bwd)
