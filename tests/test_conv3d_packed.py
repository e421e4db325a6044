"""Lane-packed 3D conv vs the lax.conv oracle.

The packed/banded formulations (ops/conv3d.py) must be exact reorderings
of the direct convolution at every CostRegNet channel configuration
(reference shapes: rmvd/models/blocks/mvsnet_components.py:69-123).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustmvd_tpu.ops.conv3d import (
    Conv3dPacked,
    conv3d_op,
    conv3d_packed,
    conv3d_packed_s2,
)


def _oracle(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


CASES = [
    # (D, H, W, Cin, Cout) — CostRegNet stride-1 layers + prob head
    (8, 6, 10, 32, 8),
    (8, 6, 10, 8, 8),
    (4, 4, 5, 16, 16),
    (3, 4, 7, 8, 1),   # W not a multiple of any tile
    (2, 3, 4, 64, 64),
]


@pytest.mark.parametrize("banded", [True, False])
@pytest.mark.parametrize("case", CASES)
def test_conv3d_packed_matches_oracle(rng, case, banded):
    D, H, W, C, Co = case
    x = jnp.asarray(rng.randn(2, D, H, W, C).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 3, C, Co) * 0.1).astype(np.float32))
    want = np.asarray(_oracle(x, k))
    got = np.asarray(conv3d_packed(x, k, banded=banded))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("tile", [1, 3, 4, 16])
def test_conv3d_packed_tile_sweep(rng, tile):
    x = jnp.asarray(rng.randn(1, 4, 5, 9, 8).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 3, 8, 8) * 0.1).astype(np.float32))
    want = np.asarray(_oracle(x, k))
    for banded in (True, False):
        got = np.asarray(conv3d_packed(x, k, tile=tile, banded=banded))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv3d_packed_bf16_close_to_fp32(rng):
    x32 = rng.randn(1, 6, 6, 12, 8).astype(np.float32)
    k32 = (rng.randn(3, 3, 3, 8, 8) * 0.1).astype(np.float32)
    want = np.asarray(_oracle(jnp.asarray(x32), jnp.asarray(k32)))
    got = np.asarray(
        conv3d_packed(
            jnp.asarray(x32, jnp.bfloat16), jnp.asarray(k32, jnp.bfloat16)
        ),
        np.float32,
    )
    assert np.mean(np.abs(got - want)) / (np.mean(np.abs(want)) + 1e-9) < 2e-2


def test_conv3d_module_param_compat(rng):
    """Conv3dPacked exposes the same variable tree as nn.Conv, so swapping

    implementations never touches checkpoints or weight conversion."""
    import flax.linen as nn

    x = jnp.asarray(rng.randn(1, 4, 4, 6, 8).astype(np.float32))
    ref_mod = nn.Conv(4, kernel_size=(3, 3, 3), padding=((1, 1),) * 3)
    packed_mod = Conv3dPacked(4)
    v_ref = ref_mod.init(jax.random.PRNGKey(0), x)
    v_packed = packed_mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(
        v_packed
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(v_ref), jax.tree_util.tree_leaves(v_packed)
    ):
        assert a.shape == b.shape

    # same params -> same output as the flax conv
    out_ref = np.asarray(ref_mod.apply(v_ref, x))
    out_packed = np.asarray(packed_mod.apply(v_ref, x))
    np.testing.assert_allclose(out_packed, out_ref, rtol=2e-5, atol=2e-5)


def test_conv3d_op_factory(rng):
    import flax.linen as nn

    xla_mod = conv3d_op(4, use_bias=False, dtype=jnp.float32, name=None, impl="xla")
    assert isinstance(xla_mod, nn.Conv)
    banded_mod = conv3d_op(4, use_bias=False, dtype=jnp.float32, name=None, impl="banded")
    assert isinstance(banded_mod, Conv3dPacked) and banded_mod.banded
    packed_mod = conv3d_op(4, use_bias=False, dtype=jnp.float32, name=None, impl="packed")
    assert isinstance(packed_mod, Conv3dPacked) and not packed_mod.banded

    x = jnp.asarray(rng.randn(1, 4, 4, 6, 8).astype(np.float32))
    v = xla_mod.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(banded_mod.apply(v, x)),
        np.asarray(xla_mod.apply(v, x)),
        rtol=2e-5,
        atol=2e-5,
    )


@pytest.mark.parametrize(
    "case",
    [
        (8, 6, 10, 8, 16, None),
        (7, 5, 9, 16, 32, 2),   # odd dims
        (8, 6, 10, 32, 64, None),
        (6, 4, 8, 8, 16, 3),
    ],
)
def test_conv3d_packed_s2_matches_oracle(rng, case):
    D, H, W, C, Co, tile = case
    x = jnp.asarray(rng.randn(2, D, H, W, C).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 3, C, Co) * 0.1).astype(np.float32))
    want = np.asarray(
        jax.lax.conv_general_dilated(
            x, k, (2, 2, 2), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    )
    got = np.asarray(conv3d_packed_s2(x, k, tile=tile))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv3d_s2_module_param_compat(rng):
    """Conv3dPackedS2 matches nn.Conv(strides=2) params and outputs."""
    import flax.linen as nn

    from robustmvd_tpu.ops.conv3d import Conv3dPackedS2

    x = jnp.asarray(rng.randn(1, 6, 4, 10, 8).astype(np.float32))
    ref_mod = nn.Conv(
        16, kernel_size=(3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3,
        use_bias=False,
    )
    s2_mod = Conv3dPackedS2(16, tile=3)
    v = ref_mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        s2_mod.init(jax.random.PRNGKey(0), x)
    )
    np.testing.assert_allclose(
        np.asarray(s2_mod.apply(v, x)),
        np.asarray(ref_mod.apply(v, x)),
        rtol=2e-5,
        atol=2e-5,
    )


def test_conv3d_packed_gradients_match(rng):
    """Backward pass parity: same cotangents through both formulations."""
    x = jnp.asarray(rng.randn(1, 4, 4, 6, 8).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 3, 8, 8) * 0.1).astype(np.float32))

    def loss_oracle(k_):
        return jnp.sum(_oracle(x, k_) ** 2)

    def loss_packed(k_):
        return jnp.sum(conv3d_packed(x, k_, banded=True) ** 2)

    g0 = np.asarray(jax.grad(loss_oracle)(k))
    g1 = np.asarray(jax.grad(loss_packed)(k))
    np.testing.assert_allclose(g1, g0, rtol=1e-3, atol=1e-4)
