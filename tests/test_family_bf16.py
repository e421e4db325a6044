"""MVSNet-family mixed precision: bf16 compute with fp32 params, fp32 BN

statistics, fp32 variance accumulation and fp32 prediction/softmax heads —
the robust_mvd template (models/robust_mvd.py) applied to
mvsnet_train / vis_mvsnet / cvp_mvsnet (VERDICT r02 item 6; reference
components: rmvd/models/blocks/mvsnet_components.py:69-123).

Asserts for each family: identical fp32 param tree, fp32 outputs, and
bounded deviation from the fp32 forward on the same weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustmvd_tpu.models import create_model


def _family_inputs(rng, B, V, H, W):
    images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32) - 0.4)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for i in range(1, V):
        poses[:, i, 0, 3] = 0.1 * i
        poses[:, i, 1, 3] = 0.02
    intr = np.tile(
        np.array([[0.8 * W, 0, W / 2], [0, 0.8 * H, H / 2], [0, 0, 1]], np.float32),
        (B, V, 1, 1),
    )
    kv = jnp.zeros((B,), jnp.int32)
    return images, jnp.asarray(poses), jnp.asarray(intr), kv


def _assert_same_param_tree(m32, m16):
    l32 = jax.tree_util.tree_leaves(m32.variables)
    l16 = jax.tree_util.tree_leaves(m16.variables)
    assert len(l32) == len(l16)
    assert all(a.dtype == b.dtype == jnp.float32 for a, b in zip(l32, l16))
    assert all((np.asarray(a) == np.asarray(b)).all() for a, b in zip(l32, l16))


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("mvsnet_train", {"num_sampling_steps": 32}),
        ("vis_mvsnet", {}),
        ("cvp_mvsnet", {}),
    ],
)
def test_family_bf16_forward(rng, name, kwargs):
    m32 = create_model(name, pretrained=False, weights=None, **kwargs)
    m16 = create_model(name, pretrained=False, weights=None, dtype="bfloat16", **kwargs)
    _assert_same_param_tree(m32, m16)

    B, V, H, W = 1, 3, 64, 64
    images, poses, intr, kv = _family_inputs(rng, B, V, H, W)
    if name == "cvp_mvsnet":
        extra32 = extra16 = (jnp.full((B,), 2.0), jnp.full((B,), 20.0))
        args = lambda m, e: m.module.apply(
            m.variables, images, poses, intr, kv, e[0], e[1]
        )
    else:
        dr = (jnp.full((B,), 2.0), jnp.full((B,), 20.0))
        extra32 = extra16 = dr
        args = lambda m, e: m.module.apply(m.variables, images, poses, intr, kv, e)

    p32, _ = jax.jit(lambda: args(m32, extra32))()
    p16, _ = jax.jit(lambda: args(m16, extra16))()

    d32 = np.asarray(p32["depth"], np.float32)
    d16 = np.asarray(p16["depth"], np.float32)
    assert p16["depth"].dtype == jnp.float32  # heads stay fp32

    scale = np.abs(d32).mean() + 1e-6
    mean_rel = np.abs(d16 - d32).mean() / scale
    assert mean_rel < 0.05, f"{name}: bf16 deviates {mean_rel:.4f} from fp32"
