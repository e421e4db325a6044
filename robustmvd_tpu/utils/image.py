"""Host-side (numpy) image resizing with torch-compatible semantics.

The data pipeline is numpy-only; these resizers match
``torch.nn.functional.interpolate(align_corners=False)`` (half-pixel centers,
no antialias) for bilinear, and order-0 zoom semantics for nearest — the two
modes the reference data/eval path relies on (rmvd/data/transforms.py:40-133).
"""

from __future__ import annotations

import numpy as np


def _source_coords_halfpixel(out_size: int, in_size: int) -> np.ndarray:
    scale = in_size / out_size
    return (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5


def resize_bilinear(img: np.ndarray, size) -> np.ndarray:
    """Bilinear resize of (..., H, W) with half-pixel centers, no antialias.

    Dispatches to the native C++ kernel (robustmvd_tpu/native/rmvd_io.cpp)
    when available; numpy fallback below is semantically identical."""
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = img.shape[-2], img.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return np.asarray(img, dtype=np.float32)

    from .native import resize_bilinear_native

    native = resize_bilinear_native(img, (out_h, out_w))
    if native is not None:
        return native

    img = np.asarray(img, dtype=np.float32)

    ys = np.clip(_source_coords_halfpixel(out_h, in_h), 0, in_h - 1)
    xs = np.clip(_source_coords_halfpixel(out_w, in_w), 0, in_w - 1)

    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0).astype(np.float32)
    wx = (xs - x0).astype(np.float32)

    rows0 = img[..., y0, :]
    rows1 = img[..., y1, :]
    rows = rows0 * (1 - wy)[..., :, None] + rows1 * wy[..., :, None]
    cols0 = rows[..., :, x0]
    cols1 = rows[..., :, x1]
    return cols0 * (1 - wx) + cols1 * wx


def resize_nearest(img: np.ndarray, size) -> np.ndarray:
    """Order-0 resize of (..., H, W): each output pixel takes the nearest

    source pixel under half-pixel mapping (matches scipy ``zoom(order=0)``
    within rounding convention used by the reference target resizing).
    """
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = img.shape[-2], img.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return np.asarray(img)

    ys = np.clip(np.round(_source_coords_halfpixel(out_h, in_h)).astype(np.int64), 0, in_h - 1)
    xs = np.clip(np.round(_source_coords_halfpixel(out_w, in_w)).astype(np.int64), 0, in_w - 1)
    return img[..., ys, :][..., :, xs]
