"""Pallas kernels vs jnp reference implementations.

On CPU the kernels run in interpreter mode; on TPU they compile to Mosaic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustmvd_tpu.ops.pallas.softargmin import (
    fused_soft_argmin,
    fused_soft_argmin_reference,
)


def _run_kernel(volume, window):
    # interpret mode auto-selected off-TPU
    return fused_soft_argmin(volume, window=window, tile=128)


@pytest.mark.parametrize("D", [16, 64])
def test_fused_soft_argmin_matches_reference(rng, D):
    B, H, W = 2, 8, 24
    vol = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32) * 3)

    p, e, ent, pm = _run_kernel(vol, window=2)
    rp, re_, rent, rpm = fused_soft_argmin_reference(vol, window=2)

    np.testing.assert_allclose(np.asarray(p), np.asarray(rp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e), np.asarray(re_), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ent), np.asarray(rent), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(rpm), atol=1e-5)


def test_fused_soft_argmin_padding(rng):
    """Non-multiple-of-tile pixel counts are padded and unpadded correctly."""
    B, D, H, W = 1, 16, 5, 7  # HW = 35, well below one tile
    vol = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    p, e, ent, pm = _run_kernel(vol, window=1)
    rp, re_, rent, rpm = fused_soft_argmin_reference(vol, window=1)
    np.testing.assert_allclose(np.asarray(p), np.asarray(rp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(rpm), atol=1e-5)
