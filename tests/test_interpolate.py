"""Resizing parity with torch F.interpolate (the reference's resampling in

decoder upsampling and loss GT downsampling)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from robustmvd_tpu.ops.interpolate import (
    resize_bilinear,
    resize_nearest_torch,
)
from robustmvd_tpu.utils.image import resize_bilinear as np_resize_bilinear


@pytest.mark.parametrize("size", [(8, 12), (14, 22), (7, 9)])
def test_device_bilinear_upsample_matches_torch(rng, size):
    x = rng.randn(2, 4, 6, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), size))
    theirs = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        size=size,
        mode="bilinear",
        align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("size", [(4, 6), (3, 5), (8, 12)])
def test_nearest_torch_matches_torch(rng, size):
    x = rng.randn(1, 12, 18, 2).astype(np.float32)
    ours = np.asarray(resize_nearest_torch(jnp.asarray(x), size))
    theirs = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=size, mode="nearest"
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("size", [(64, 96), (100, 150), (37, 53)])
def test_host_bilinear_matches_torch(rng, size):
    """Host numpy resizer (input adapter) vs torch bilinear upsampling."""
    x = rng.rand(2, 3, 50, 75).astype(np.float32) * 255
    ours = np_resize_bilinear(x, size)
    theirs = F.interpolate(
        torch.from_numpy(x), size=size, mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-4)
