"""Model forward smoke tests: shapes, finiteness, key/source splitting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustmvd_tpu.models import create_model, list_models
from robustmvd_tpu.models.robust_mvd import split_key_sources


def test_list_models():
    models = list_models()
    assert "robust_mvd" in models
    assert "robust_mvd_5M" in models
    assert "mvsnet_train" in models
    assert "robust_mvd" in list_models(trainable_only=True)
    assert "mvsnet_train" not in list_models(trainable_only=True)


def test_split_key_sources(rng):
    B, V = 3, 4
    x = jnp.asarray(rng.rand(B, V, 2).astype(np.float32))
    kv = jnp.asarray(np.array([0, 2, 3]))
    key, sources = split_key_sources(x, kv)
    np.testing.assert_allclose(np.asarray(key)[0], np.asarray(x)[0, 0])
    np.testing.assert_allclose(np.asarray(key)[1], np.asarray(x)[1, 2])
    np.testing.assert_allclose(np.asarray(key)[2], np.asarray(x)[2, 3])
    # sources preserve original order with the key removed
    np.testing.assert_allclose(np.asarray(sources)[1], np.asarray(x)[1, [0, 1, 3]])
    np.testing.assert_allclose(np.asarray(sources)[2], np.asarray(x)[2, [0, 1, 2]])


@pytest.mark.slow
def test_robust_mvd_forward_run(rng):
    model = create_model("robust_mvd", pretrained=False, weights=None)
    B, V, H, W = 1, 3, 128, 192
    images = [rng.rand(B, 3, H, W).astype(np.float32) * 255 for _ in range(V)]
    K = np.array([[[500, 0, 96], [0, 500, 64], [0, 0, 1]]], dtype=np.float32)
    Ks = [K.copy() for _ in range(V)]
    poses = [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)) for _ in range(V)]
    for i in range(1, V):
        poses[i][:, 0, 3] = 0.1 * i
    pred, aux = model.run(
        images=images, keyview_idx=np.array([0]), poses=poses, intrinsics=Ks
    )
    assert pred["depth"].shape == (B, 1, H // 2, W // 2)
    assert pred["depth_uncertainty"].shape == (B, 1, H // 2, W // 2)
    assert np.isfinite(pred["depth"]).all()
    assert len(aux["invdepths_all"]) == 6
    # coarse-to-fine scales 1/64 .. 1/2
    assert aux["invdepths_all"][0].shape[-2:] == (H // 64, W // 64)
    assert aux["invdepths_all"][-1].shape[-2:] == (H // 2, W // 2)


@pytest.mark.slow
def test_mvsnet_forward_run(rng):
    model = create_model(
        "mvsnet_train", pretrained=False, weights=None, num_sampling_steps=32
    )
    B, V, H, W = 1, 3, 64, 96
    images = [rng.rand(B, 3, H, W).astype(np.float32) * 255 for _ in range(V)]
    K = np.array([[[80, 0, 48], [0, 80, 32], [0, 0, 1]]], dtype=np.float32)
    Ks = [K.copy() for _ in range(V)]
    poses = [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)) for _ in range(V)]
    for i in range(1, V):
        poses[i][:, 0, 3] = 0.1 * i
    pred, aux = model.run(
        images=images,
        keyview_idx=np.array([0]),
        poses=poses,
        intrinsics=Ks,
        depth_range=(np.array([2.0]), np.array([10.0])),
    )
    assert pred["depth"].shape == (B, 1, H // 4, W // 4)
    assert np.isfinite(pred["depth"]).all()
    d = pred["depth"]
    assert d.min() >= 2.0 - 1e-3 and d.max() <= 10.0 + 1e-3


@pytest.mark.slow
def test_robust_mvd_bf16(rng):
    """Mixed-precision (bfloat16) forward: identical param tree, fp32
    prediction heads, small deviation from the fp32 path."""
    m32 = create_model("robust_mvd", pretrained=False, weights=None, remat=False)
    m16 = create_model(
        "robust_mvd", pretrained=False, weights=None, remat=False, dtype="bfloat16"
    )
    leaves32 = jax.tree_util.tree_leaves(m32.variables)
    leaves16 = jax.tree_util.tree_leaves(m16.variables)
    assert all(a.dtype == b.dtype == jnp.float32 for a, b in zip(leaves32, leaves16))
    assert all((np.asarray(a) == np.asarray(b)).all() for a, b in zip(leaves32, leaves16))

    B, V, H, W = 1, 2, 64, 128
    images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32) - 0.4)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    poses[:, 1, 0, 3] = 0.1
    K = np.tile(
        np.array([[0.8, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], np.float32), (B, V, 1, 1)
    )
    kv = jnp.zeros((B,), jnp.int32)
    _, aux32 = m32.module.apply(
        m32.variables, images, jnp.asarray(poses), jnp.asarray(K), kv
    )
    _, aux16 = m16.module.apply(
        m16.variables, images, jnp.asarray(poses), jnp.asarray(K), kv
    )
    i32 = np.asarray(aux32["invdepth"])
    i16 = np.asarray(aux16["invdepth"])
    assert i16.dtype == np.float32  # prediction heads stay fp32
    # bf16 compute error stays small relative to the invdepth scale
    scale = np.abs(i32).mean() + 1e-6
    assert np.abs(i16 - i32).mean() / scale < 0.05


def test_robust_mvd_bf16_grads(rng):
    """Mixed-precision training path: gradients through the bf16 compute
    graph (convs without an explicit f32 output dtype — the conv transpose
    rule rejects mixed f32-cotangent/bf16-kernel operands) are finite and
    aligned with the fp32 gradients."""
    m32 = create_model(
        "robust_mvd", pretrained=False, weights=None, train=True, remat=False
    )
    m16 = create_model(
        "robust_mvd", pretrained=False, weights=None, train=True, remat=False,
        dtype="bfloat16",
    )
    B, V, H, W = 1, 2, 64, 128
    images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32) - 0.4)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    poses[:, 1, 0, 3] = 0.1
    K = np.tile(
        np.array([[0.8, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], np.float32), (B, V, 1, 1)
    )
    kv = jnp.zeros((B,), jnp.int32)
    gt = jnp.asarray((1.0 / (1.0 + 9.0 * rng.rand(B, H, W, 1))).astype(np.float32))

    def make_loss(model):
        def loss_fn(params):
            variables = dict(model.variables)
            variables["params"] = params
            _, aux = model.module.apply(
                variables, images, jnp.asarray(poses), jnp.asarray(K), kv
            )
            pred = aux["invdepths_all"][-1]  # finest decoder scale (1/2 res)
            gt_s = gt[:, ::2, ::2]
            mask = gt_s > 0
            return jnp.sum(jnp.abs(pred - gt_s) * mask) / jnp.sum(mask)
        return loss_fn

    g32 = jax.grad(make_loss(m32))(m32.variables["params"])
    g16 = jax.grad(make_loss(m16))(m16.variables["params"])

    flat32 = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g32)])
    flat16 = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g16)])
    assert np.isfinite(flat16).all()
    assert np.abs(flat16).max() > 0
    cos = np.dot(flat32, flat16) / (np.linalg.norm(flat32) * np.linalg.norm(flat16) + 1e-12)
    assert cos > 0.98, cos
