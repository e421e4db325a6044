"""Pallas banded conv3d vs the lax.conv oracle (interpret mode on CPU).

The Mosaic kernel (ops/pallas/conv3d.py) must be an exact reordering of
the direct convolution; its VJP routes through the XLA banded path and
must match the oracle's gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustmvd_tpu.ops.pallas.conv3d import conv3d_banded_pallas


def _oracle(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


CASES = [
    # (D, H, W, Cin, Cout, tile, block_d)
    (8, 6, 10, 8, 8, 4, 4),
    (5, 4, 7, 8, 1, 4, 4),     # D not a multiple of block_d; W of tile
    (8, 6, 10, 32, 8, 2, 8),
    (4, 4, 5, 16, 16, 3, 2),
    (8, 6, 12, 8, 8, None, 8),  # default tile selection
]


@pytest.mark.parametrize("case", CASES)
def test_pallas_conv3d_matches_oracle(rng, case):
    D, H, W, C, Co, tile, bd = case
    x = jnp.asarray(rng.randn(2, D, H, W, C).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 3, C, Co) * 0.1).astype(np.float32))
    want = np.asarray(_oracle(x, k))
    got = np.asarray(conv3d_banded_pallas(x, k, tile, bd))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_conv3d_gradients(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 6, 8).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 3, 8, 8) * 0.1).astype(np.float32))

    g0 = jax.grad(lambda kk: jnp.sum(_oracle(x, kk) ** 2))(k)
    g1 = jax.grad(
        lambda kk: jnp.sum(conv3d_banded_pallas(x, kk, 4, 4) ** 2)
    )(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-3, atol=1e-4)

    gx0 = jax.grad(lambda xx: jnp.sum(_oracle(xx, k) ** 2))(x)
    gx1 = jax.grad(
        lambda xx: jnp.sum(conv3d_banded_pallas(xx, k, 4, 4) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), rtol=1e-3, atol=1e-4)


def test_pallas_conv3d_bf16(rng):
    x32 = rng.randn(1, 6, 6, 12, 8).astype(np.float32)
    k32 = (rng.randn(3, 3, 3, 8, 8) * 0.1).astype(np.float32)
    want = np.asarray(_oracle(jnp.asarray(x32), jnp.asarray(k32)))
    got = np.asarray(
        conv3d_banded_pallas(
            jnp.asarray(x32, jnp.bfloat16), jnp.asarray(k32, jnp.bfloat16), 4, 4
        ),
        np.float32,
    )
    assert np.mean(np.abs(got - want)) / (np.mean(np.abs(want)) + 1e-9) < 2e-2
