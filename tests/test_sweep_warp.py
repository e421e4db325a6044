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


def test_bfloat16_path(rng):
    ref, src, sp, rpi, dv = _setup(rng, 1, 2, 16, 24, 8, 12)
    ref16, src16 = ref.astype(jnp.bfloat16), src.astype(jnp.bfloat16)
    a = np.asarray(_xla_variance(ref16, src16, sp, rpi, dv)).astype(np.float32)
    b = np.asarray(
        warp_variance(ref16, src16, sp, rpi, dv, dc=4, band=4, interpret=True)
    ).astype(np.float32)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 3e-2  # bf16 tent quantization
