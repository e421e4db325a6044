"""Device-side resizing with torch-interpolate-compatible semantics.

Used for the decoder's prediction upsampling (reference:
rmvd/models/blocks/dispnet_decoder.py:88-121 — ``F.interpolate(bilinear,
align_corners=False)``) and nearest-neighbor GT downsampling inside losses
(rmvd/loss/multi_scale_uni_laplace.py). jax.image.resize with half-pixel
centers matches torch's align_corners=False convention; antialias is
disabled to match torch (which never antialiases in these call sites).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x, size):
    """Resize (..., H, W, C) to (..., size[0], size[1], C), bilinear,

    half-pixel centers, no antialias (== torch align_corners=False upsample).
    """
    *lead, H, W, C = x.shape
    out_shape = (*lead, int(size[0]), int(size[1]), C)
    return jax.image.resize(x, out_shape, method="bilinear", antialias=False)


def resize_nearest(x, size):
    """Nearest resize of (..., H, W, C)."""
    *lead, H, W, C = x.shape
    out_shape = (*lead, int(size[0]), int(size[1]), C)
    return jax.image.resize(x, out_shape, method="nearest", antialias=False)


def resize_nearest_torch(x, size):
    """torch ``F.interpolate(mode="nearest")`` parity: legacy floor-based

    asymmetric indexing ``src = floor(dst * in/out)`` — NOT half-pixel.
    The reference resamples loss ground truth this way
    (rmvd/loss/multi_scale_uni_laplace.py:92-99), so exact-pixel parity of
    training targets requires this variant. x: (..., H, W, C).
    """
    *lead, H, W, C = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    ys = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    ys = jnp.clip(ys, 0, H - 1)
    xs = jnp.clip(xs, 0, W - 1)
    x = jnp.take(x, ys, axis=-3)
    x = jnp.take(x, xs, axis=-2)
    return x
