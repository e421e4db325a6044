"""Bilinear sampling (the TPU-native `grid_sample` equivalent).

The reference framework leans on ``torch.nn.functional.grid_sample`` with
``align_corners=False`` for every warp (rmvd/models/blocks/planesweep_corr.py:
49-104, rmvd/models/blocks/utils.py:222-268). On TPU there is no gather-based
texture unit; we express bilinear sampling as four row-gathers from the
flattened spatial axis plus a lerp, which XLA lowers to efficient dynamic
gathers, and fuse the surrounding arithmetic.

Two coordinate conventions are provided:

- :func:`bilinear_sample`: coordinates in *index space* — sampling position
  ``x`` lands on pixel center ``i`` when ``x == i``.
- :func:`warp`: the reference's pixel-center convention, where incoming grids
  hold coordinates with pixel ``i`` centered at ``i + 0.5`` and the
  torch normalization ``2*x/W - 1`` (align_corners=False) is implied
  (reference: planesweep_corr.py:81-104). Internally this is just
  ``index = coord - 0.5``.

Padding modes follow torch semantics: ``zeros`` (out-of-bounds taps read 0)
and ``border`` (coordinates clamped to the edge).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bilinear_sample(img, x, y, padding_mode="zeros"):
    """Sample ``img`` bilinearly at index-space coordinates.

    Args:
        img: (B, H, W, C) feature map.
        x: (B, *S) sample x coordinates in index space (x == j hits pixel
           column j exactly).
        y: (B, *S) sample y coordinates.
        padding_mode: "zeros" | "border".

    Returns:
        (values, in_bounds): (B, *S, C) sampled values and (B, *S) float mask
        that is 1 where *all four* taps were in bounds (the reference's
        mask-from-ones >= 0.9999 criterion, planesweep_corr.py:95-102).
    """
    B, H, W, C = img.shape
    sample_shape = x.shape[1:]
    x = x.reshape(B, -1)
    y = y.reshape(B, -1)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def in_range(xi, yi):
        return (
            (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        )

    v00 = in_range(x0i, y0i)
    v01 = in_range(x1i, y0i)
    v10 = in_range(x0i, y1i)
    v11 = in_range(x1i, y1i)

    x0c = jnp.clip(x0i, 0, W - 1)
    x1c = jnp.clip(x1i, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y1i, 0, H - 1)

    w00 = ((1 - wx) * (1 - wy))[..., None]
    w01 = (wx * (1 - wy))[..., None]
    w10 = ((1 - wx) * wy)[..., None]
    w11 = (wx * wy)[..., None]

    if padding_mode == "zeros":
        # Quad-tap gather: all four taps of a bilinear sample live in ONE
        # row of a quad buffer — quad[t, k] = (img[t-1,k-1], img[t-1,k],
        # img[t,k-1], img[t,k]) with zeros outside the image — so a single
        # 4C-wide row gather per sample replaces the four C-wide (or two
        # 2C-wide) gathers. TPU gathers are descriptor-bound: quartering
        # the descriptor count at 4x the row width measured 1.5x faster
        # than the paired-tap variant at the MVSNet warp shapes on v5e.
        # Per-tap validity weights make every boundary case exact
        # (out-of-range taps are weighted to 0; edge taps read the
        # buffer's structural zeros).
        zcol = jnp.zeros((B, H, 1, C), img.dtype)
        pairs = jnp.concatenate(
            [
                jnp.concatenate([zcol, img], axis=2),  # left tap:  img[k-1]
                jnp.concatenate([img, zcol], axis=2),  # right tap: img[k]
            ],
            axis=-1,
        )  # (B, H, W+1, 2C)
        zrow = jnp.zeros((B, 1, W + 1, 2 * C), img.dtype)
        quad = jnp.concatenate(
            [
                jnp.concatenate([zrow, pairs], axis=1),  # top taps:    pairs[t-1]
                jnp.concatenate([pairs, zrow], axis=1),  # bottom taps: pairs[t]
            ],
            axis=-1,
        ).reshape(B, (H + 1) * (W + 1), 4 * C)

        k = jnp.clip(x0i + 1, 0, W)
        t = jnp.clip(y0i + 1, 0, H)
        idx = t * (W + 1) + k  # (B, P)
        rows = jnp.take_along_axis(quad, idx[..., None], axis=1)
        out = (
            rows[..., 0 * C : 1 * C] * (w00 * v00[..., None])
            + rows[..., 1 * C : 2 * C] * (w01 * v01[..., None])
            + rows[..., 2 * C : 3 * C] * (w10 * v10[..., None])
            + rows[..., 3 * C : 4 * C] * (w11 * v11[..., None])
        )
    else:
        flat = img.reshape(B, H * W, C)

        def gather(yi, xi):
            idx = yi * W + xi  # (B, P)
            return jnp.take_along_axis(flat, idx[..., None], axis=1)

        out = (
            gather(y0c, x0c) * w00
            + gather(y0c, x1c) * w01
            + gather(y1c, x0c) * w10
            + gather(y1c, x1c) * w11
        )

    # all-taps-in-bounds mask (weight-aware: a tap with zero weight does not
    # invalidate the sample), matching sampled-ones >= 0.9999.
    ones_w = (
        w00[..., 0] * v00 + w01[..., 0] * v01 + w10[..., 0] * v10 + w11[..., 0] * v11
    )
    mask = (ones_w >= 0.9999).astype(img.dtype)

    out = out.reshape(B, *sample_shape, C)
    mask = mask.reshape(B, *sample_shape)
    return out, mask


def warp(img, grid, padding_mode="zeros"):
    """Warp with the reference's pixel-center grid convention.

    Args:
        img: (B, H, W, C) source feature map.
        grid: (B, *S, 2) sampling locations, last axis (x, y), in pixel-center
            coordinates (pixel i centered at i + 0.5), i.e. the grids produced
            by the plane-sweep sampler (planesweep_corr.py:489-512).
        padding_mode: "zeros" | "border".

    Returns:
        (warped, mask): (B, *S, C) and (B, *S). For ``border`` the mask is all
        ones (reference: planesweep_corr.py:95-96).
    """
    x = grid[..., 0] - 0.5
    y = grid[..., 1] - 0.5
    out, mask = bilinear_sample(img, x, y, padding_mode=padding_mode)
    if padding_mode == "border":
        mask = jnp.ones_like(mask)
    return out, mask


def grid_sample_normalized(img, grid_n, padding_mode="zeros"):
    """torch-parity entry point: normalized grid in [-1, 1], align_corners=False.

    Args:
        img: (B, H, W, C).
        grid_n: (B, *S, 2) normalized coordinates, last axis (x, y).

    Returns:
        (B, *S, C) sampled values (no mask), matching
        ``torch.nn.functional.grid_sample(..., align_corners=False)``.
    """
    B, H, W, C = img.shape
    x = ((grid_n[..., 0] + 1.0) * W - 1.0) / 2.0
    y = ((grid_n[..., 1] + 1.0) * H - 1.0) / 2.0
    out, _ = bilinear_sample(img, x, y, padding_mode=padding_mode)
    return out
