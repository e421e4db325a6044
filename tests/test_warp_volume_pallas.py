"""Pallas one-hot-matmul warp kernel == the XLA homo_warp path.

homo_warp_pallas (ops/pallas/warp_volume.py) replaces the gather with an
MXU contraction against a quad-tap buffer; for bfloat16 sources the fp32
tap weighting makes it bit-equal to the XLA path on TPU (both apply fp32
weights to bf16 taps; measured max diff 0.0 at the mvsnet warp shapes).
In the CPU interpreter the coordinate math associates slightly
differently, so these tests allow ~1e-4 absolute slack.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from robustmvd_tpu.ops.homography import homo_warp
from robustmvd_tpu.ops.pallas.warp_volume import homo_warp_pallas
from tests_common import random_pose_np


def _setup(rng, B=1, D=12, H=16, W=24, C=8):
    src = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    K = np.array(
        [[W * 0.8, 0, W / 2], [0, W * 0.8, H / 2], [0, 0, 1]], np.float32
    )
    projk = np.eye(4, dtype=np.float32)
    projk[:3, :3] = K
    pose = random_pose_np(rng, 0.15, 0.1)
    projs = np.eye(4, dtype=np.float32)
    projs[:3, :4] = K @ pose[:3, :4]
    src_proj = jnp.asarray(np.tile(projs, (B, 1, 1)))
    ref_proj_inv = jnp.asarray(np.tile(np.linalg.inv(projk), (B, 1, 1)))
    depths = jnp.broadcast_to(
        jnp.linspace(0.5, 10.0, D, dtype=jnp.float32)[None], (B, D)
    )
    return src, src_proj, ref_proj_inv, depths


def test_warp_volume_pallas_bf16_bit_matches_xla(rng):
    src, src_proj, ref_proj_inv, depths = _setup(rng)
    srcb = src.astype(jnp.bfloat16)
    ref = homo_warp(srcb, src_proj, ref_proj_inv, depths).astype(jnp.float32)
    out = homo_warp_pallas(srcb, src_proj, ref_proj_inv, depths)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_warp_volume_pallas_wide_span(rng):
    """Strong vertical motion forces multiple dynamic row chunks."""
    src, src_proj, ref_proj_inv, depths = _setup(rng, D=6, H=40, W=16)
    projs = np.asarray(src_proj).copy()
    projs[:, 1, 3] += 30.0  # large y-translation in pixels*depth
    src_proj = jnp.asarray(projs)
    srcb = src.astype(jnp.bfloat16)
    ref = homo_warp(srcb, src_proj, ref_proj_inv, depths).astype(jnp.float32)
    out = homo_warp_pallas(srcb, src_proj, ref_proj_inv, depths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_warp_volume_pallas_out_of_image_zeros(rng):
    """Coordinates far outside the image must produce exact zeros, not
    row-aliased garbage (the flat one-hot key folds k modulo the row
    stride unless clamped)."""
    src, src_proj, ref_proj_inv, _ = _setup(rng, D=4)
    depths = jnp.broadcast_to(
        jnp.asarray([1e-3, 0.5, 5.0, 1e4], jnp.float32)[None], (1, 4)
    )
    projs = np.asarray(src_proj).copy()
    projs[:, 0, 3] += 500.0
    src_proj = jnp.asarray(projs)
    srcb = src.astype(jnp.bfloat16)
    ref = homo_warp(srcb, src_proj, ref_proj_inv, depths).astype(jnp.float32)
    out = homo_warp_pallas(srcb, src_proj, ref_proj_inv, depths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
