"""Visualization: turbo-colormapped depth/error maps and image rendering.

Capability parity with the reference's `vis` dispatcher
(rmvd/utils/vis.py:184-466): 2D float arrays are colormapped with the turbo
colormap over their valid range (invalid = 0/non-finite pixels drawn black);
3HW/HW3 uint8-like arrays are rendered as images. Returns PIL images.
"""

from __future__ import annotations

import numpy as np


def _turbo_table():
    """Polynomial approximation of the turbo colormap (Google AI blog, 2019).

    Returns a (256, 3) uint8 lookup table.
    """
    x = np.linspace(0.0, 1.0, 256)
    # 4th-degree polynomial fits of the turbo channels
    r = np.polyval([59.28, -152.94, 128.55, -42.66, 4.61, 0.135], x)
    g = np.polyval([-14.0, 4.8, 25.9, -42.4, 25.0, 0.09], x)
    b = np.polyval([-89.9, 252.5, -254.3, 105.3, -5.0, 0.28], x)
    # normalized channel curves: clamp into [0, 1]
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.clip(rgb, 0, 1)
    return (rgb * 255).astype(np.uint8)


_TURBO = _turbo_table()


def colormap_2d(arr, mark_invalid=True, clip_range=None):
    """Map a 2D float array to a turbo-colored uint8 RGB image."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 3 and arr.shape[0] == 1:
        arr = arr[0]
    valid = np.isfinite(arr)
    if mark_invalid:
        valid &= arr != 0
    vals = arr[valid]
    if clip_range is not None:
        lo, hi = clip_range
    elif vals.size:
        lo, hi = float(np.min(vals)), float(np.max(vals))
    else:
        lo, hi = 0.0, 1.0
    denom = (hi - lo) if hi > lo else 1.0
    norm = np.clip((arr - lo) / denom, 0, 1)
    idx = (norm * 255).astype(np.uint8)
    rgb = _TURBO[idx]
    rgb[~valid] = 0
    return rgb


def vis(data, **kwargs):
    """Dispatch visualization: 2D arrays -> turbo colormap; images -> PIL."""
    from PIL import Image

    data = np.asarray(data)
    if data.ndim == 3 and data.shape[0] in (1,):
        data = data[0]
    if data.ndim == 2:
        return Image.fromarray(colormap_2d(data, **kwargs))
    if data.ndim == 3 and data.shape[0] == 3:  # CHW image
        return Image.fromarray(
            np.clip(data.transpose(1, 2, 0), 0, 255).astype(np.uint8)
        )
    if data.ndim == 3 and data.shape[-1] == 3:  # HWC image
        return Image.fromarray(np.clip(data, 0, 255).astype(np.uint8))
    raise ValueError(f"vis: unsupported array shape {data.shape}")


def vis_2d_array(arr, **kwargs):
    return vis(arr, **kwargs)
