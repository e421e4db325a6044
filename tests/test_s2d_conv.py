"""Space-to-depth stride-2 conv rewrite: exactness vs the direct conv.

The DispNet encoder's first conv (7x7 stride 2 on a 3-channel image,
reference: rmvd/models/blocks/dispnet_encoder.py:16) is pathological on
TPU because XLA pads the 3 input channels to the 128-lane width. The
s2d rewrite must be numerically identical (up to f32 reduction order)
and parameter-tree identical so torch checkpoints keep loading.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustmvd_tpu.models.blocks.dispnet import ConvLReLU, _s2d_conv_stride2


@pytest.mark.parametrize("k,cin", [(7, 3), (5, 64), (3, 128)])
def test_s2d_matches_direct_conv(rng, k, cin):
    x = jnp.asarray(rng.randn(2, 32, 48, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, cin, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
    p = (k - 1) // 2
    direct = (
        jax.lax.conv_general_dilated(
            x, w, (2, 2), ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b
    )
    s2d = _s2d_conv_stride2(x, w, b)
    assert s2d.shape == direct.shape
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct), atol=2e-5)


def test_s2d_module_param_tree_and_values_match(rng):
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    m_direct = ConvLReLU(16, kernel_size=7, stride=2, s2d=False)
    m_s2d = ConvLReLU(16, kernel_size=7, stride=2, s2d=True)
    v = m_direct.init(jax.random.PRNGKey(0), x)
    v2 = m_s2d.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(lambda a: a.shape, v) == jax.tree.map(lambda a: a.shape, v2)
    y_direct = m_direct.apply(v, x)
    y_s2d = m_s2d.apply(v, x)  # same params through both paths
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_direct), atol=2e-5)


def test_s2d_gradients_match(rng):
    """The rewrite is linear in the kernel; grads must match the direct path."""
    x = jnp.asarray(rng.randn(1, 16, 24, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 8).astype(np.float32) * 0.1)
    b = jnp.zeros((8,), jnp.float32)

    def loss_direct(w):
        y = (
            jax.lax.conv_general_dilated(
                x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + b
        )
        return jnp.sum(y**2)

    def loss_s2d(w):
        return jnp.sum(_s2d_conv_stride2(x, w, b) ** 2)

    g1 = jax.grad(loss_direct)(w)
    g2 = jax.grad(loss_s2d)(w)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-4, atol=1e-4)


def test_s2d_odd_size_falls_back(rng):
    """Odd spatial sizes can't be 2x2-blocked; ConvLReLU must fall back."""
    x = jnp.asarray(rng.randn(1, 33, 47, 3).astype(np.float32))
    m = ConvLReLU(8, kernel_size=7, stride=2, s2d=True)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 17, 24, 8)
