"""Fused soft-argmin Pallas kernel.

The MVSNet-family readout (softmax over the hypothesis axis, expectation of
the index, entropy, and the windowed probability mass —
rmvd/models/blocks/utils.py:51-68) is memory-bound: naively it reads and
writes the (B, D, h, w) score volume four times through HBM. This kernel
streams the volume once: each program loads a (D, T) tile of hypothesis
columns into VMEM and produces the probability tile plus all three reduced
maps in registers.

Grid: (B, HW // T). Tile T=512 lanes; D is the sublane axis (multiples of
8 for f32 — all model configs use D in {16, 32, 64, 192, 256}).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(window, v_ref, prob_ref, exp_ref, ent_ref, win_ref):
    v = v_ref[0]  # (D, T)
    D = v.shape[0]

    m = jnp.max(v, axis=0, keepdims=True)
    e = jnp.exp(v - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    p = e / s  # (D, T)

    # Mosaic iota must be integer-typed
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0).astype(v.dtype)
    expectation = jnp.sum(idx * p, axis=0, keepdims=True)  # (1, T)

    prob_ref[0] = p
    exp_ref[0] = expectation
    ent_ref[0] = jnp.sum(-p * jnp.log(jnp.clip(p, 1e-9, 1.0)), axis=0, keepdims=True)
    mask = (jnp.abs(idx - expectation) <= window).astype(p.dtype)
    win_ref[0] = jnp.sum(p * mask, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("window", "tile", "interpret"))
def fused_soft_argmin(volume, window=2, tile=512, interpret=None):
    """Fused softmax + index expectation + entropy + windowed prob mass.

    Args:
        volume: (B, D, H, W) score volume, float32.
        window: index window for the probability mass (reference
            soft_argmin's ``window``; pass the model's value).
        tile: lanes per program.

    Returns:
        prob_volume (B, D, H, W), expectation (B, 1, H, W),
        entropy (B, 1, H, W), prob_map (B, 1, H, W).
    """
    B, D, H, W = volume.shape
    P = H * W
    pad = (-P) % tile
    v = volume.reshape(B, D, P)
    if pad:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
    Pp = P + pad

    grid = (B, Pp // tile)
    in_spec = pl.BlockSpec((1, D, tile), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM)
    out_specs = (
        pl.BlockSpec((1, D, tile), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, D, Pp), volume.dtype),
        jax.ShapeDtypeStruct((B, 1, Pp), volume.dtype),
        jax.ShapeDtypeStruct((B, 1, Pp), volume.dtype),
        jax.ShapeDtypeStruct((B, 1, Pp), volume.dtype),
    )

    if interpret is None:
        # Mosaic kernels need a TPU; everywhere else run interpreted.
        # Honor an explicit CPU default device (tests) even when a TPU
        # backend exists.
        default_dev = jax.config.jax_default_device
        platform = (
            default_dev.platform if default_dev is not None else jax.default_backend()
        )
        interpret = platform != "tpu"

    prob, expectation, entropy, prob_map = pl.pallas_call(
        functools.partial(_kernel, float(window)),
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(v)

    def unpad(a):
        return a[:, :, :P].reshape(B, a.shape[1], H, W)

    return unpad(prob), unpad(expectation), unpad(entropy), unpad(prob_map)


def fused_soft_argmin_reference(volume, window=2):
    """jnp reference implementation (used for CPU fallback and testing)."""
    p = jax.nn.softmax(volume, axis=1)
    D = volume.shape[1]
    idx = jnp.arange(D, dtype=volume.dtype).reshape(1, D, 1, 1)
    expectation = jnp.sum(idx * p, axis=1, keepdims=True)
    entropy = jnp.sum(-p * jnp.log(jnp.clip(p, 1e-9, 1.0)), axis=1, keepdims=True)
    mask = (jnp.abs(idx - expectation) <= window).astype(p.dtype)
    prob_map = jnp.sum(p * mask, axis=1, keepdims=True)
    return p, expectation, entropy, prob_map
