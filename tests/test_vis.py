"""Visualization toolkit parity behaviors (reference: rmvd/utils/vis.py)."""

import numpy as np
import pytest

from robustmvd_tpu.utils.vis import (
    cat_images_colwise,
    cat_images_rowwise,
    check_vis,
    colormap_2d,
    invalidate_np_array,
    vis,
    vis_2d_array,
    vis_image,
)


def test_vis_dispatch_shapes(rng):
    # 2D -> map; CHW -> image; N-HW -> batch of maps; NCHW dispatch
    assert vis(rng.rand(16, 24).astype(np.float32)).size == (24, 16)
    assert vis(rng.rand(3, 16, 24).astype(np.float32) * 255).size == (24, 16)
    assert vis(rng.rand(4, 16, 24).astype(np.float32)).size == (24, 16)  # first of batch
    assert vis(rng.rand(2, 1, 16, 24).astype(np.float32)).size == (24, 16)
    assert vis(rng.rand(2, 3, 16, 24).astype(np.float32) * 255).size == (24, 16)
    with pytest.raises((ValueError, AssertionError)):
        vis(rng.rand(2, 2, 16, 24).astype(np.float32))


def test_vis_full_batch_concat(rng):
    arr = rng.rand(3, 16, 24).astype(np.float32)
    cols = vis_2d_array(arr, full_batch=True)
    rows = vis_2d_array(arr, full_batch="rows")
    assert cols.size == (24 * 3, 16)
    assert rows.size == (24, 16 * 3)
    labeled = vis_2d_array(arr, full_batch=True, batch_labels=["a", "b", "c"])
    assert labeled.size == cols.size


def test_check_vis():
    assert check_vis(np.zeros((4, 4)))
    assert check_vis(np.zeros((3, 4, 4)))
    assert check_vis(np.zeros((2, 1, 4, 4)))
    assert check_vis(np.zeros((2, 3, 4, 4)))
    assert not check_vis(np.zeros((2, 2, 4, 4)))
    assert not check_vis(np.zeros(5))


def test_invalidate_np_array_auto_thresholds(rng):
    arr = rng.randn(32, 32).astype(np.float32)
    arr[0, 0] = np.nan
    arr[0, 1] = np.inf
    arr[1, 0] = 7.0
    out, invalid, inv_vals, clip, up, lo, hi_t, lo_t = invalidate_np_array(
        arr, clipping=True, invalid_values=[7.0]
    )
    assert inv_vals[0, 0] and inv_vals[0, 1] and inv_vals[1, 0]
    assert np.all(out[invalid] == 0)
    # auto thresholds are mean +- 2 std bounded by the valid min/max
    valid = arr[~inv_vals]
    assert hi_t <= np.max(valid) + 1e-6
    assert lo_t >= np.min(valid) - 1e-6
    assert np.all(out[~invalid] <= hi_t + 1e-6)


def test_vis_np_out_format(rng):
    out = vis(rng.rand(8, 8).astype(np.float32), out_format={"type": "np"})
    assert isinstance(out, np.ndarray) and out.shape == (8, 8, 3) and out.dtype == np.uint8


def test_vis_constant_and_all_invalid():
    assert vis(np.full((8, 8), 5.0, np.float32)).size == (8, 8)
    assert vis(np.zeros((8, 8), np.float32), invalid_values=[0], mark_invalid=True).size == (8, 8)


def test_colormap_marks_invalid_black():
    arr = np.linspace(0.1, 1.0, 64, dtype=np.float32).reshape(8, 8)
    arr[0, 0] = 0.0
    rgb = colormap_2d(arr, mark_invalid=True)
    assert tuple(rgb[0, 0]) == (0, 0, 0)
    assert rgb[4, 4].sum() > 0


def test_cat_images_pads_to_common_size(rng):
    from PIL import Image

    a = Image.fromarray((rng.rand(8, 12, 3) * 255).astype(np.uint8))
    b = Image.fromarray((rng.rand(10, 6, 3) * 255).astype(np.uint8))
    assert cat_images_colwise([a, b]).size == (24, 10)
    assert cat_images_rowwise([a, b]).size == (12, 20)
