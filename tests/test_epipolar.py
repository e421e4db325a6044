"""Epipolar plane-sweep geometry vs a float64 numpy projection oracle

(the closed-form coefficients of the reference,
rmvd/models/blocks/planesweep_corr.py:228-349)."""

import numpy as np
import pytest

import jax.numpy as jnp

from robustmvd_tpu.ops.epipolar import (
    make_epipolar_coeffs,
    planesweep_points,
    sampling_invdepths,
)


def random_pose(rng, scale=0.5):
    """Random small rigid transform."""
    aa = rng.randn(3) * 0.2
    angle = np.linalg.norm(aa)
    axis = aa / (angle + 1e-12)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    t = rng.randn(3) * scale
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T.astype(np.float32)


def project_oracle(K_key_abs, K_src_abs, T, x, y, d):
    """float64 oracle: unproject key pixel (x, y) at depth 1/d, transform,

    project into the source camera."""
    z = 1.0 / d
    p = np.linalg.solve(K_key_abs.astype(np.float64), np.array([x, y, 1.0])) * z
    p_src = T[:3, :3].astype(np.float64) @ p + T[:3, 3].astype(np.float64)
    uvw = K_src_abs.astype(np.float64) @ p_src
    return uvw[0] / uvw[2], uvw[1] / uvw[2], p_src[2]


def test_planesweep_points_match_projection_oracle(rng):
    """Exact check in float64 (the float32 path shares the rational-form

    cancellation characteristics of the reference's torch implementation)."""
    import jax

    H, W = 12, 16
    Hs, Ws = 10, 14
    K_key_rel = np.array(
        [[1.2, 0, 0.5], [0, 1.6, 0.55], [0, 0, 1]], dtype=np.float64
    )
    K_src_rel = np.array(
        [[1.1, 0, 0.48], [0, 1.5, 0.52], [0, 0, 1]], dtype=np.float64
    )
    T = random_pose(rng).astype(np.float64)

    with jax.enable_x64(True):
        invd = sampling_invdepths(0.4, 1000.0, 8, dtype=jnp.float64)
        coeffs = make_epipolar_coeffs(
            jnp.asarray(K_key_rel[None]),
            jnp.asarray(K_src_rel[None]),
            jnp.asarray(T[None]),
            height=H,
            width=W,
            height_source=Hs,
            width_source=Ws,
        )
        us, vs, mask = planesweep_points(coeffs, invd)
        us, vs, mask = np.asarray(us), np.asarray(vs), np.asarray(mask)
        invd_np = np.asarray(invd)[0]

    K_key_abs = K_key_rel * np.array([[W] * 3, [H] * 3, [1] * 3])
    K_src_abs = K_src_rel * np.array([[Ws] * 3, [Hs] * 3, [1] * 3])

    for s in [0, 3, 7]:
        for (yy, xx) in [(0, 0), (5, 7), (H - 1, W - 1)]:
            u_o, v_o, z_src = project_oracle(
                K_key_abs, K_src_abs, T, xx + 0.5, yy + 0.5, float(invd_np[s])
            )
            assert us[0, s, yy, xx] == pytest.approx(u_o, rel=1e-9, abs=1e-9)
            assert vs[0, s, yy, xx] == pytest.approx(v_o, rel=1e-9, abs=1e-9)
            # visibility: both depths positive
            assert bool(mask[0, s, yy, xx]) == (z_src > 0)


def test_sampling_invdepths_linear_invdepth():
    invd = np.asarray(sampling_invdepths(0.4, 1000.0, 256))
    assert invd.shape == (1, 256)
    assert invd[0, 0] == pytest.approx(1 / 1000.0)
    assert invd[0, -1] == pytest.approx(1 / 0.4)
    diffs = np.diff(invd[0])
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-4)


def test_sampling_invdepths_linear_depth():
    invd = np.asarray(sampling_invdepths(2.0, 10.0, 5, sampling_type="linear_depth"))
    # depths linear 2,4,6,8,10 -> invdepths ascending 0.1 ... 0.5
    np.testing.assert_allclose(invd[0], [0.1, 0.125, 1 / 6, 0.25, 0.5], rtol=1e-5)


def test_identity_pose_projects_to_same_pixels(rng):
    """With identity pose and equal intrinsics, every hypothesis must project

    each pixel onto itself."""
    H = W = 8
    K = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], dtype=np.float32)
    T = np.eye(4, dtype=np.float32)
    invd = sampling_invdepths(0.4, 1000.0, 4)
    coeffs = make_epipolar_coeffs(
        jnp.asarray(K[None]), jnp.asarray(K[None]), jnp.asarray(T[None]), H, W
    )
    us, vs, mask = planesweep_points(coeffs, invd)
    xs = np.arange(W) + 0.5
    ys = np.arange(H) + 0.5
    np.testing.assert_allclose(np.asarray(us)[0, 0, 0, :], xs, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vs)[0, 0, :, 0], ys, atol=1e-4)
    assert np.all(np.asarray(mask))
