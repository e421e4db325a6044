"""MVSNet-family mixed precision: bf16 compute with fp32 params, fp32 BN

statistics, fp32 variance accumulation and fp32 prediction/softmax heads —
the robust_mvd template (models/robust_mvd.py) applied to
mvsnet_train / vis_mvsnet / cvp_mvsnet (VERDICT r02 item 6; reference
components: rmvd/models/blocks/mvsnet_components.py:69-123).

Asserts for each family: identical fp32 param tree, fp32 outputs, and
METRIC-level agreement with the fp32 forward on the same weights
(reference metric semantics: rmvd/eval/metrics.py:32-103): the bf16
prediction scored against the fp32 prediction as ground truth must sit
inside the benchmark's own sensitivity (absrel well under one point,
1.03-inliers near 100), and the absrel/inlier deltas against a common
synthetic GT must be fractions of a point — a bf16 regression that moved
benchmark numbers would fail these bounds (VERDICT r03 item 9).
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

    d32 = np.asarray(p32["depth"], np.float32)[..., 0]
    d16 = np.asarray(p16["depth"], np.float32)[..., 0]
    assert p16["depth"].dtype == jnp.float32  # heads stay fp32

    from robustmvd_tpu.eval.metrics import m_rel_ae, thresh_inliers

    # (a) bf16 scored against fp32 as GT: the bf16 path must be
    # metric-indistinguishable from fp32 under the benchmark's own
    # measures (absrel in points = x100, inliers at the 1.03 threshold)
    ones = np.ones_like(d32)
    # benchmark scaling: both metrics in points (x100), as published
    rel_vs_fp32 = m_rel_ae(gt=d32, pred=d16, mask=ones, output_scaling_factor=100.0)
    inl_vs_fp32 = thresh_inliers(
        gt=d32, pred=d16, thresh=1.03, mask=ones, output_scaling_factor=100.0
    )
    assert rel_vs_fp32 < 1.0, f"{name}: bf16-vs-fp32 absrel {rel_vs_fp32:.3f} points"
    assert inl_vs_fp32 > 97.0, f"{name}: bf16-vs-fp32 1.03-inliers {inl_vs_fp32:.2f}"

    # (b) metric DELTAS against a common synthetic GT: fractions of a point
    gt = (2.0 + 16.0 * np.random.RandomState(7).rand(*d32.shape)).astype(np.float32)
    kw = dict(mask=ones, output_scaling_factor=100.0)
    rel32 = m_rel_ae(gt=gt, pred=d32, **kw)
    rel16 = m_rel_ae(gt=gt, pred=d16, **kw)
    inl32 = thresh_inliers(gt=gt, pred=d32, thresh=1.03, **kw)
    inl16 = thresh_inliers(gt=gt, pred=d16, thresh=1.03, **kw)
    print(
        f"{name}: bf16-vs-fp32 rel={rel_vs_fp32:.5f}pts inl={inl_vs_fp32:.2f} | "
        f"delta_rel={abs(rel16 - rel32):.5f}pts delta_inl={abs(inl16 - inl32):.4f}pts"
    )
    assert abs(rel16 - rel32) < 0.5, f"{name}: absrel delta {abs(rel16 - rel32):.3f}"
    assert abs(inl16 - inl32) < 2.0, f"{name}: inlier delta {abs(inl16 - inl32):.4f}"
