"""Native C++ host-IO kernels vs the numpy reference implementations."""

import numpy as np
import pytest

from robustmvd_tpu.utils.native import (
    get_lib,
    resize_bilinear_native,
    resize_nearest_native,
)

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


def _np_bilinear(img, size):
    # numpy fallback path inside utils.image (forced)
    from robustmvd_tpu.utils.image import _source_coords_halfpixel

    out_h, out_w = size
    in_h, in_w = img.shape[-2:]
    img = np.asarray(img, dtype=np.float32)
    ys = np.clip(_source_coords_halfpixel(out_h, in_h), 0, in_h - 1)
    xs = np.clip(_source_coords_halfpixel(out_w, in_w), 0, in_w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0).astype(np.float32)
    wx = (xs - x0).astype(np.float32)
    rows = img[..., y0, :] * (1 - wy)[..., :, None] + img[..., y1, :] * wy[..., :, None]
    return rows[..., :, x0] * (1 - wx) + rows[..., :, x1] * wx


@pytest.mark.parametrize("size", [(64, 96), (100, 150), (33, 47)])
def test_native_bilinear_matches_numpy(size):
    rng = np.random.RandomState(0)
    img = rng.rand(3, 50, 75).astype(np.float32) * 255
    native = resize_bilinear_native(img, size)
    ref = _np_bilinear(img, size)
    np.testing.assert_allclose(native, ref, atol=1e-3, rtol=1e-5)


def test_native_nearest_matches_numpy():
    from robustmvd_tpu.utils.image import resize_nearest

    rng = np.random.RandomState(1)
    img = rng.rand(1, 40, 60).astype(np.float32)
    native = resize_nearest_native(img, (20, 30))
    ref = resize_nearest(img, (20, 30))
    np.testing.assert_array_equal(native, ref)


def test_native_speedup_is_real():
    """The native path should not be slower than numpy on large images."""
    import time

    rng = np.random.RandomState(2)
    img = rng.rand(3, 1024, 1536).astype(np.float32)

    t0 = time.perf_counter()
    for _ in range(3):
        resize_bilinear_native(img, (768, 1152))
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(3):
        _np_bilinear(img, (768, 1152))
    t_numpy = time.perf_counter() - t0

    assert t_native < t_numpy * 1.5  # not slower (usually much faster)
