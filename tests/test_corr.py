"""Plane-sweep correlation: matmul and gather formulations must agree with

each other and with a brute-force numpy oracle implementing the reference
semantics (rmvd/models/blocks/planesweep_corr.py:143-195 TorchCorr)."""

import numpy as np
import pytest

import jax.numpy as jnp

from robustmvd_tpu.ops.corr import planesweep_correlation, planesweep_correlation_single
from robustmvd_tpu.ops.epipolar import (
    make_epipolar_coeffs,
    planesweep_points,
    sampling_invdepths,
)

from test_epipolar import random_pose


def brute_force_corr(feat_key, feat_src, us, vs, vis):
    """Numpy oracle: per-pixel dot of key features with bilinearly sampled

    source features, zeros padding, all-taps-in-bounds mask."""
    B, H, W, C = feat_key.shape
    Hs, Ws = feat_src.shape[1:3]
    S = us.shape[1]
    corr = np.zeros((B, H, W, S), np.float32)
    mask = np.zeros((B, H, W, S), np.float32)
    for b in range(B):
        for s in range(S):
            for i in range(H):
                for j in range(W):
                    x = us[b, s, i, j] - 0.5
                    y = vs[b, s, i, j] - 0.5
                    x0, y0 = int(np.floor(x)), int(np.floor(y))
                    wx, wy = x - x0, y - y0
                    acc = np.zeros(C, np.float64)
                    wtot = 0.0
                    for dy, wyy in ((0, 1 - wy), (1, wy)):
                        for dx, wxx in ((0, 1 - wx), (1, wx)):
                            xi, yi = x0 + dx, y0 + dy
                            if 0 <= xi < Ws and 0 <= yi < Hs:
                                acc += feat_src[b, yi, xi] * (wxx * wyy)
                                wtot += wxx * wyy
                    val = float(np.dot(acc, feat_key[b, i, j])) / np.sqrt(C)
                    m = float(wtot >= 0.9999) * float(vis[b, s, i, j])
                    corr[b, i, j, s] = val * m
                    mask[b, i, j, s] = m
    return corr, mask


@pytest.fixture
def small_problem(rng):
    B, H, W, C, S = 1, 6, 8, 16, 5
    feat_key = rng.randn(B, H, W, C).astype(np.float32)
    feat_src = rng.randn(B, H, W, C).astype(np.float32)
    K = np.array([[1.1, 0, 0.5], [0, 1.4, 0.5], [0, 0, 1]], dtype=np.float32)[None]
    T = random_pose(rng)[None]
    invd = np.asarray(sampling_invdepths(0.5, 100.0, S))
    return feat_key, feat_src, K, T, invd


@pytest.mark.parametrize("impl", ["matmul", "gather", "pallas", "pixelscan"])
def test_corr_matches_brute_force(small_problem, impl):
    feat_key, feat_src, K, T, invd = small_problem
    H, W = feat_key.shape[1:3]

    corr, mask = planesweep_correlation_single(
        jnp.asarray(feat_key),
        jnp.asarray(feat_src),
        jnp.asarray(K),
        jnp.asarray(K),
        jnp.asarray(T),
        jnp.asarray(invd),
        impl=impl,
    )

    coeffs = make_epipolar_coeffs(
        jnp.asarray(K), jnp.asarray(K), jnp.asarray(T), H, W
    )
    us, vs, vis = planesweep_points(coeffs, jnp.asarray(invd))
    ref_corr, ref_mask = brute_force_corr(
        feat_key, feat_src, np.asarray(us), np.asarray(vs), np.asarray(vis)
    )

    np.testing.assert_allclose(np.asarray(mask), ref_mask, atol=1e-6)
    np.testing.assert_allclose(np.asarray(corr), ref_corr, atol=1e-4, rtol=1e-4)


def test_matmul_and_gather_agree(rng):
    B, V, H, W, C, S = 2, 3, 8, 10, 8, 7
    feat_key = rng.randn(B, H, W, C).astype(np.float32)
    feat_srcs = rng.randn(B, V, H, W, C).astype(np.float32)
    K = np.tile(
        np.array([[1.1, 0, 0.5], [0, 1.4, 0.5], [0, 0, 1]], dtype=np.float32),
        (B, 1, 1),
    )
    Ks = np.tile(K[:, None], (1, V, 1, 1))
    Ts = np.stack(
        [np.stack([random_pose(rng) for _ in range(V)]) for _ in range(B)]
    )

    out = {}
    for impl in ("matmul", "gather", "pixelscan"):
        corrs, masks, invd = planesweep_correlation(
            jnp.asarray(feat_key),
            jnp.asarray(feat_srcs),
            jnp.asarray(K),
            jnp.asarray(Ks),
            jnp.asarray(Ts),
            num_sampling_points=S,
            min_depth=0.5,
            max_depth=50.0,
            impl=impl,
        )
        out[impl] = (np.asarray(corrs), np.asarray(masks))

    np.testing.assert_array_equal(out["matmul"][1], out["gather"][1])
    np.testing.assert_allclose(out["matmul"][0], out["gather"][0], atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(out["matmul"][1], out["pixelscan"][1])
    np.testing.assert_allclose(
        out["matmul"][0], out["pixelscan"][0], atol=1e-4, rtol=1e-4
    )


def test_identity_pose_correlates_in_place(rng):
    """Identity pose: correlation at every hypothesis equals the in-place

    feature dot product / sqrt(C)."""
    B, H, W, C, S = 1, 6, 6, 4, 3
    feat = rng.randn(B, H, W, C).astype(np.float32)
    K = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], dtype=np.float32)[None]
    T = np.eye(4, dtype=np.float32)[None]
    invd = np.asarray(sampling_invdepths(0.5, 10.0, S))
    corr, mask = planesweep_correlation_single(
        jnp.asarray(feat), jnp.asarray(feat), jnp.asarray(K), jnp.asarray(K),
        jnp.asarray(T), jnp.asarray(invd), impl="matmul",
    )
    expected = (feat * feat).sum(-1) / np.sqrt(C)  # (B, H, W)
    for s in range(S):
        np.testing.assert_allclose(
            np.asarray(corr)[0, :, :, s], expected[0], atol=1e-4, rtol=1e-4
        )
