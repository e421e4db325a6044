"""dz-decomposed 3D conv lowerings == the direct lax.conv oracle.

conv3d_dz2d / conv3d_transposed_dz2d (ops/conv3d.py) reorder the 3x3x3
conv into three D-shifted 2D convs (4-6x the XLA 3D emitter on v5e); this
pins exactness against the direct lowering for every stride/output_padding
combination the family blocks use (reference behavior:
rmvd/models/blocks/mvsnet_components.py:25-41,69-123,
cvp_mvsnet_components.py:85-128).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from robustmvd_tpu.ops.conv3d import conv3d_dz2d, conv3d_transposed_dz2d


def _rand(rng, *shape):
    return jnp.asarray(rng.rand(*shape).astype(np.float32) - 0.5)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("shape", [(2, 12, 10, 14, 5), (1, 7, 9, 11, 3)])
def test_conv3d_dz2d_matches_oracle(rng, stride, shape):
    x = _rand(rng, *shape)
    k = _rand(rng, 3, 3, 3, shape[-1], 6)
    ref = lax.conv_general_dilated(
        x, k, (stride,) * 3, ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    out = conv3d_dz2d(x, k, stride=stride)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("stride,output_padding", [(2, 1), (2, 0), (1, 0)])
def test_conv3d_transposed_dz2d_matches_oracle(rng, stride, output_padding):
    B, D, H, W, C, Co = 2, 12, 10, 14, 5, 7
    x = _rand(rng, B, D, H, W, C)
    k = _rand(rng, 3, 3, 3, C, Co)
    pad_lo = 1
    pad_hi = 1 + output_padding
    ref = lax.conv_general_dilated(
        x, k, (1, 1, 1), ((pad_lo, pad_hi),) * 3,
        lhs_dilation=(stride,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    out = conv3d_transposed_dz2d(x, k, stride=stride, output_padding=output_padding)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conv3d_dz2d_gradients_match(rng):
    """The decomposition is differentiable and its grads equal the
    oracle's (vis_mvsnet trains through these convs)."""
    x = _rand(rng, 1, 6, 8, 10, 4)
    k = _rand(rng, 3, 3, 3, 4, 5)

    def loss_ref(x, k):
        o = lax.conv_general_dilated(
            x, k, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return jnp.sum(o**2)

    def loss_new(x, k):
        return jnp.sum(conv3d_dz2d(x, k, stride=1) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gn = jax.grad(loss_new, argnums=(0, 1))(x, k)
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
