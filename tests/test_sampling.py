"""Bilinear sampling vs torch.nn.functional.grid_sample (the reference's

sampling primitive, rmvd/models/blocks/planesweep_corr.py:91-104)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from robustmvd_tpu.ops.sampling import bilinear_sample, grid_sample_normalized, warp


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(rng, padding_mode):
    B, H, W, C = 2, 13, 17, 5
    img = rng.randn(B, H, W, C).astype(np.float32)
    # grids spanning in-bounds and far out-of-bounds
    grid = (rng.rand(B, 9, 11, 2).astype(np.float32) * 3.0) - 1.5

    ours = grid_sample_normalized(jnp.asarray(img), jnp.asarray(grid), padding_mode)
    ours = np.asarray(ours)

    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    tgrid = torch.from_numpy(grid)
    theirs = F.grid_sample(
        timg, tgrid, mode="bilinear", padding_mode=padding_mode, align_corners=False
    )
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_warp_pixel_convention_matches_reference_normalization(rng):
    """The reference converts pixel-center grids via 2x/W - 1 then samples

    align_corners=False (planesweep_corr.py:81-93); our warp() must agree."""
    B, H, W, C = 1, 8, 10, 3
    img = rng.randn(B, H, W, C).astype(np.float32)
    grid_pix = rng.rand(B, 6, 7, 2).astype(np.float32)
    grid_pix[..., 0] *= W + 4  # include OOB
    grid_pix[..., 1] *= H + 4
    grid_pix -= 2.0

    ours, mask = warp(jnp.asarray(img), jnp.asarray(grid_pix), padding_mode="zeros")

    grid_n = np.stack(
        [2 * grid_pix[..., 0] / W - 1, 2 * grid_pix[..., 1] / H - 1], axis=-1
    )
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    theirs = F.grid_sample(
        timg,
        torch.from_numpy(grid_n),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5, rtol=1e-5)

    # mask parity with the reference's ones-image trick (>= 0.9999)
    ones = torch.ones(B, 1, H, W)
    tmask = F.grid_sample(
        ones, torch.from_numpy(grid_n), padding_mode="zeros", align_corners=False
    ).numpy()[:, 0]
    tmask = (tmask >= 0.9999).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(mask), tmask)


def test_bilinear_sample_exact_at_centers(rng):
    B, H, W, C = 1, 6, 7, 2
    img = rng.randn(B, H, W, C).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    vals, mask = bilinear_sample(
        jnp.asarray(img),
        jnp.asarray(xs[None].astype(np.float32)),
        jnp.asarray(ys[None].astype(np.float32)),
    )
    np.testing.assert_allclose(np.asarray(vals), img, atol=1e-6)
    assert np.all(np.asarray(mask) == 1.0)


def test_border_padding_clamps(rng):
    B, H, W, C = 1, 5, 5, 1
    img = rng.randn(B, H, W, C).astype(np.float32)
    x = jnp.asarray(np.array([[-3.0, 10.0]], dtype=np.float32))
    y = jnp.asarray(np.array([[-3.0, 10.0]], dtype=np.float32))
    vals, _ = bilinear_sample(jnp.asarray(img), x, y, padding_mode="border")
    np.testing.assert_allclose(np.asarray(vals)[0, 0], img[0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(vals)[0, 1], img[0, -1, -1], atol=1e-6)
