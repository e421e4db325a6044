"""Parity tests for the fused banded-MXU warp+variance kernel

(ops/pallas/sweep_warp.py) against the homo_warp + E[x^2]-E[x]^2 scan
path it replaces (reference semantics: rmvd/models/blocks/utils.py:222-268
+ rmvd/models/mvsnet.py:124-137). Runs in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robustmvd_tpu.ops.homography import homo_warp
from robustmvd_tpu.ops.pallas.sweep_warp import warp_variance


def _setup(rng, B, V, h, w, C, D, shift=0.1):
    ref_feat = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    src_feats = jnp.asarray(rng.randn(B, V, h, w, C).astype(np.float32))
    W = w * 4
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V + 1, 1, 1))
    for i in range(1, V + 1):
        poses[:, i, 0, 3] = shift * i
        poses[:, i, 1, 3] = shift / 2 * i
    K = np.array(
        [[W * 0.8 * 0.25, 0, w / 2], [0, W * 0.8 * 0.25, h / 2], [0, 0, 1]],
        np.float32,
    )
    proj = np.tile(np.eye(4, dtype=np.float32), (B, V + 1, 1, 1))
    for i in range(V + 1):
        proj[:, i, :3, :4] = K @ poses[:, i, :3, :4]
    proj = jnp.asarray(proj)
    rpi = jnp.linalg.inv(proj[:, 0])
    sp = proj[:, 1:]
    dv = jnp.broadcast_to(
        jnp.linspace(0.5, 10.0, D, dtype=jnp.float32)[None], (B, D)
    )
    return ref_feat, src_feats, sp, rpi, dv


def _xla_variance(ref_feat, src_feats, sp, rpi, dv, valid=None):
    B, V = src_feats.shape[:2]
    D = dv.shape[1]
    h, w, C = ref_feat.shape[1:]
    if valid is None:
        valid = jnp.ones((B, V), jnp.float32)
    rv = jnp.broadcast_to(ref_feat[:, None], (B, D, h, w, C)).astype(jnp.float32)
    vs, vq = rv, rv**2
    for v in range(V):
        wp = homo_warp(src_feats[:, v], sp[:, v], rpi, dv).astype(jnp.float32)
        wp = wp * valid[:, v].reshape(B, 1, 1, 1, 1)
        vs = vs + wp
        vq = vq + wp**2
    n = (1.0 + jnp.sum(valid, axis=1)).reshape(B, 1, 1, 1, 1)
    return vq / n - (vs / n) ** 2


@pytest.mark.parametrize("dc,band", [(4, 4), (6, 2), (12, 8)])
def test_matches_xla_path(rng, dc, band):
    ref, src, sp, rpi, dv = _setup(rng, 1, 2, 16, 24, 8, 12)
    a = np.asarray(_xla_variance(ref, src, sp, rpi, dv))
    b = np.asarray(
        warp_variance(ref, src, sp, rpi, dv, dc=dc, band=band, interpret=True)
    )
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


def test_depth_padding(rng):
    # D=10 not divisible by dc=4: padded depths are computed then sliced off
    ref, src, sp, rpi, dv = _setup(rng, 1, 2, 16, 24, 8, 10)
    a = np.asarray(_xla_variance(ref, src, sp, rpi, dv))
    b = np.asarray(warp_variance(ref, src, sp, rpi, dv, dc=4, band=4, interpret=True))
    assert b.shape == (1, 10, 16, 24, 8)
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


def test_view_masking(rng):
    # a masked view slot must not contribute, and count must track it
    ref, src, sp, rpi, dv = _setup(rng, 1, 3, 16, 24, 8, 8)
    valid = jnp.asarray([[1.0, 1.0, 0.0]])
    a = np.asarray(_xla_variance(ref, src, sp, rpi, dv, valid))
    b = np.asarray(
        warp_variance(ref, src, sp, rpi, dv, src_valid=valid, dc=4, band=4, interpret=True)
    )
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


def test_offimage_rows(rng):
    # large shift pushes bands beyond the image: tents must zero them and
    # segment slices must stay in the padded range (exactness + no OOB)
    ref, src, sp, rpi, dv = _setup(rng, 1, 2, 16, 24, 8, 12, shift=0.8)
    a = np.asarray(_xla_variance(ref, src, sp, rpi, dv))
    b = np.asarray(warp_variance(ref, src, sp, rpi, dv, dc=4, band=4, interpret=True))
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


def test_rt_mode_matches(rng):
    # R,t parameterization (cvp's rt_planesweep_warp convention)
    from robustmvd_tpu.ops.homography import rt_planesweep_warp
    from robustmvd_tpu.ops.pallas.sweep_warp import warp_variance_rt

    ref, src, sp, rpi, dv = _setup(rng, 1, 2, 16, 24, 8, 12)
    t = jnp.einsum("bvij,bjk->bvik", sp, rpi)
    rot, trans = t[:, :, :3, :3], t[:, :, :3, 3]
    B, V = 1, 2
    rv = jnp.broadcast_to(ref[:, None], (B, 12, 16, 24, 8)).astype(jnp.float32)
    vs, vq = rv, rv**2
    for v in range(V):
        wp = rt_planesweep_warp(src[:, v], rot[:, v], trans[:, v], dv).astype(jnp.float32)
        vs = vs + wp
        vq = vq + wp**2
    a = np.asarray(vq / 3.0 - (vs / 3.0) ** 2)
    b = np.asarray(warp_variance_rt(ref, src, rot, trans, dv, dc=4, band=4, interpret=True))
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


def test_dense_hypos_matches(rng):
    # per-pixel hypotheses (cvp's proj_cost semantics)
    from robustmvd_tpu.ops.homography import rt_planesweep_warp
    from robustmvd_tpu.ops.pallas.sweep_warp import warp_variance_dense

    B, V, h, w, C, D = 1, 2, 16, 24, 8, 6
    ref, src, sp, rpi, dv = _setup(rng, B, V, h, w, C, D)
    t = jnp.einsum("bvij,bjk->bvik", sp, rpi)
    rot, trans = t[:, :, :3, :3], t[:, :, :3, 3]
    base = jnp.asarray(2.0 + rng.rand(B, 1, h, w).astype(np.float32))
    hypos = base + jnp.linspace(-0.5, 0.5, D)[None, :, None, None]  # (B,D,h,w)

    rv = jnp.broadcast_to(ref[:, None], (B, D, h, w, C)).astype(jnp.float32)
    vs, vq = rv, rv**2
    for v in range(V):
        wp = rt_planesweep_warp(
            src[:, v], rot[:, v], trans[:, v], hypos.reshape(B, D, h * w)
        ).astype(jnp.float32)
        vs = vs + wp
        vq = vq + wp**2
    a = np.asarray(vq / 3.0 - (vs / 3.0) ** 2)
    b = np.asarray(
        warp_variance_dense(ref, src, rot, trans, hypos, dc=3, band=4, interpret=True)
    )
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


def test_homography_group_cost_matches(rng):
    # Vis-MVSNet per-pair pipeline: get_homographies -> homography_warping
    # -> groupwise_correlation vs the fused kernel
    from robustmvd_tpu.ops.homography import get_homographies, homography_warping
    from robustmvd_tpu.ops.pallas.sweep_warp import homography_group_cost
    from robustmvd_tpu.ops.reductions import groupwise_correlation

    B, h, w, C, D = 1, 16, 24, 16, 6
    ref = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    src = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    cams = np.zeros((B, 2, 4, 4), np.float32)
    cams[:, 0] = np.eye(4)
    cams[:, 1, :3, :3] = np.array(
        [[w * 0.8, 0, w / 2], [0, w * 0.8, h / 2], [0, 0, 1]], np.float32
    )
    cam2 = cams.copy()
    cam2[:, 0, 0, 3] = 0.15
    cam2[:, 0, 1, 3] = 0.07
    cams, cam2 = jnp.asarray(cams), jnp.asarray(cam2)
    ds = jnp.full((B, 1, 1, 1), 2.0)
    di = jnp.full((B, 1, 1, 1), 0.5)

    Hs = get_homographies(cams, cam2, D, ds, di)  # (B, D, 1, 1, 3, 3)
    src_rep = jnp.broadcast_to(src[:, None], (B, D, h, w, C)).reshape(B * D, h, w, C)
    warped = homography_warping(src_rep, Hs.reshape(B * D, 3, 3)).reshape(B, D, h, w, C)
    ref_vol = jnp.broadcast_to(ref[:, None], (B, D, h, w, C))
    a = np.asarray(groupwise_correlation(ref_vol, warped, 8, axis=-1))

    # fused: H(d) = A + Bm / (depth_d + 1e-9), grid offset folded in
    from robustmvd_tpu.ops.homography import _mm

    K_l = cams[:, 1, :3, :3]
    K_r = cam2[:, 1, :3, :3]
    R_l = cams[:, 0, :3, :3]
    R_r = cam2[:, 0, :3, :3]
    t_l = cams[:, 0, :3, 3:4]
    t_r = cam2[:, 0, :3, 3:4]
    K_l_inv = jnp.linalg.inv(K_l)
    R_lT = jnp.swapaxes(R_l, -2, -1)
    R_rT = jnp.swapaxes(R_r, -2, -1)
    fronto = R_l[:, 2:3, :3]
    c_rel = -_mm(R_rT, t_r) + _mm(R_lT, t_l)  # c_right - c_left
    KrRr = _mm(K_r, R_r)
    RlTKli = _mm(R_lT, K_l_inv)
    Amat = _mm(KrRr, RlTKli)
    Bmat = -_mm(KrRr, _mm(_mm(c_rel, fronto), RlTKli))
    S = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])[None]
    Amat = _mm(Amat, S)
    Bmat = _mm(Bmat, S)
    depths = ds.reshape(B, 1) + di.reshape(B, 1) * jnp.arange(D)[None]
    wd = jnp.broadcast_to(
        (1.0 / (depths + 1e-9))[:, :, None, None], (B, D, h, w)
    )
    b = np.asarray(
        homography_group_cost(ref, src, Amat, Bmat, wd, groups=8, dc=3, band=4, interpret=True)
    )
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)


def test_bfloat16_path(rng):
    ref, src, sp, rpi, dv = _setup(rng, 1, 2, 16, 24, 8, 12)
    ref16, src16 = ref.astype(jnp.bfloat16), src.astype(jnp.bfloat16)
    a = np.asarray(_xla_variance(ref16, src16, sp, rpi, dv)).astype(np.float32)
    b = np.asarray(
        warp_variance(ref16, src16, sp, rpi, dv, dc=4, band=4, interpret=True)
    ).astype(np.float32)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 3e-2  # bf16 tent quantization
