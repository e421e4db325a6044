"""Mesh sharding: the sharded forward must match the unsharded forward

bit-for-tolerance on a virtual 8-device CPU mesh, across data/view/hyp
splits. Also covers MeshSpec resolution and the scaling-bench harness path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustmvd_tpu.models import create_model
from robustmvd_tpu.parallel import MeshSpec, make_mesh
from robustmvd_tpu.parallel.context import use_mesh


def _sample(rng, B, V, H, W):
    images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32) - 0.4)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for i in range(1, V):
        poses[:, i, 0, 3] = 0.1 * i
        poses[:, i, 1, 3] = 0.05
    intr = np.tile(
        np.array([[0.8, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1]], dtype=np.float32),
        (B, V, 1, 1),
    )
    kv = np.zeros((B,), np.int32)
    return images, jnp.asarray(poses), jnp.asarray(intr), jnp.asarray(kv)


def test_mesh_spec_resolution(cpu_devices):
    assert MeshSpec(data=-1, view=2, hyp=2).resolve(8) == (2, 2, 2)
    assert MeshSpec(data=8).resolve(8) == (8, 1, 1)
    with pytest.raises(AssertionError):
        MeshSpec(data=3, view=2, hyp=2).resolve(8)
    mesh = make_mesh(MeshSpec(data=2, view=2, hyp=2), devices=cpu_devices)
    assert mesh.axis_names == ("data", "view", "hyp")


@pytest.mark.slow
@pytest.mark.parametrize("spec", [
    MeshSpec(data=2, view=2, hyp=2),
    MeshSpec(data=1, view=2, hyp=4),
])
def test_sharded_forward_matches_unsharded(cpu_devices, rng, spec):
    model = create_model("robust_mvd", pretrained=False, weights=None)
    B = spec.data  # batch divisible by the data axis
    V, H, W = 3, 64, 64  # V-1 = 2 source views divisible by the view axis
    args = _sample(rng, B, V, H, W)

    # compare inverse depth: depth = 1/(invdepth + 1e-9) amplifies fp noise
    # unboundedly at near-zero invdepth pixels
    _, ref_aux = jax.jit(lambda v, *a: model.module.apply(v, *a))(
        model.variables, *args
    )
    ref_invdepth = np.asarray(ref_aux["invdepth"])

    mesh = make_mesh(spec, devices=cpu_devices)
    with use_mesh(mesh):
        _, sh_aux = jax.jit(lambda v, *a: model.module.apply(v, *a))(
            model.variables, *args
        )
    sh_invdepth = np.asarray(sh_aux["invdepth"])

    np.testing.assert_allclose(sh_invdepth, ref_invdepth, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_mvsnet_view_hyp_sharded_forward(cpu_devices, rng):
    """mvsnet_train under a (data=2, view=2, hyp=2) mesh: the batched

    variance aggregation (view_parallel=True) shards warped volumes over
    "view" and hypothesis slabs over "hyp"; sharded == unsharded."""
    model = create_model(
        "mvsnet_train", pretrained=False, weights=None,
        num_sampling_steps=16, view_parallel=True,
    )
    B, V, H, W = 2, 3, 64, 64
    images, poses, intr, kv = _sample(rng, B, V, H, W)
    intr_abs = intr * jnp.asarray([[W, 1, W], [1, H, H], [1, 1, 1]], jnp.float32)
    depth_range = (jnp.full((B,), 2.0), jnp.full((B,), 20.0))
    args = (images, poses, intr_abs, kv, depth_range)

    fwd = jax.jit(
        lambda v, im, po, k, kvi, dr: model.module.apply(v, im, po, k, kvi, dr)
    )
    ref_pred, _ = fwd(model.variables, *args)
    ref_depth = np.asarray(ref_pred["depth"])

    mesh = make_mesh(MeshSpec(data=2, view=2, hyp=2), devices=cpu_devices)
    with use_mesh(mesh):
        sh_pred, _ = jax.jit(
            lambda v, im, po, k, kvi, dr: model.module.apply(v, im, po, k, kvi, dr)
        )(model.variables, *args)
    sh_depth = np.asarray(sh_pred["depth"])

    np.testing.assert_allclose(sh_depth, ref_depth, rtol=1e-4, atol=1e-4)

    # the view_parallel formulation itself must equal the scan default
    model_scan = create_model(
        "mvsnet_train", pretrained=False, weights=None, num_sampling_steps=16
    )
    scan_pred, _ = jax.jit(
        lambda v, im, po, k, kvi, dr: model_scan.module.apply(v, im, po, k, kvi, dr)
    )(model.variables, *args)
    np.testing.assert_allclose(
        np.asarray(scan_pred["depth"]), ref_depth, rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_vis_mvsnet_hyp_sharded_forward(cpu_devices, rng):
    """vis_mvsnet under a (data=2, hyp=4) mesh: per-stage cost volumes

    (D = 64/32/16) shard over "hyp"; sharded == unsharded."""
    model = create_model("vis_mvsnet", pretrained=False, weights=None)
    B, V, H, W = 2, 3, 64, 64
    images, poses, intr, kv = _sample(rng, B, V, H, W)
    intr_abs = intr * jnp.asarray([[W, 1, W], [1, H, H], [1, 1, 1]], jnp.float32)
    depth_range = (jnp.full((B,), 2.0), jnp.full((B,), 20.0))
    args = (images, poses, intr_abs, kv, depth_range)

    fwd = jax.jit(
        lambda v, im, po, k, kvi, dr: model.module.apply(v, im, po, k, kvi, dr)
    )
    ref_pred, _ = fwd(model.variables, *args)
    ref_depth = np.asarray(ref_pred["depth"])

    mesh = make_mesh(MeshSpec(data=2, view=1, hyp=4), devices=cpu_devices)
    with use_mesh(mesh):
        sh_pred, _ = jax.jit(
            lambda v, im, po, k, kvi, dr: model.module.apply(v, im, po, k, kvi, dr)
        )(model.variables, *args)
    sh_depth = np.asarray(sh_pred["depth"])

    np.testing.assert_allclose(sh_depth, ref_depth, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sharded_train_step_grad_equality(cpu_devices, rng):
    """Full train-step gradients (loss + value_and_grad through the remat

    forward) under a (2,2,2) mesh equal the unsharded gradients — the
    numeric core of multi-chip training correctness."""
    from robustmvd_tpu.loss import create_loss

    model = create_model(
        "robust_mvd", pretrained=False, weights=None, train=True
    )
    loss_obj = create_loss("robust_mvd_loss", model=model)

    B, V, H, W = 2, 3, 64, 64
    images, poses, intr, kv = _sample(rng, B, V, H, W)
    gt = {
        "invdepth": jnp.asarray(
            (1.0 / (2.0 + 8.0 * rng.rand(B, H, W, 1))).astype(np.float32)
        )
    }
    si = {"images": images, "poses": poses, "intrinsics": intr, "keyview_idx": kv}

    def loss_and_grads(variables):
        def loss_fn(params):
            vars_in = dict(variables)
            vars_in["params"] = params
            pred, aux = model.apply_fn(vars_in, **si)
            total, _, _ = loss_obj(si, gt, pred, aux, iteration=0, params=params)
            return total

        return jax.value_and_grad(loss_fn)(variables["params"])

    ref_loss, ref_grads = jax.jit(loss_and_grads)(model.variables)
    ref_loss = float(ref_loss)

    mesh = make_mesh(MeshSpec(data=2, view=2, hyp=2), devices=cpu_devices)
    with use_mesh(mesh):
        sh_loss, sh_grads = jax.jit(loss_and_grads)(model.variables)
    sh_loss = float(sh_loss)

    assert abs(sh_loss - ref_loss) < 1e-3 * abs(ref_loss)

    ref_flat = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(ref_grads)
    }
    sh_flat = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(sh_grads)
    }
    assert ref_flat.keys() == sh_flat.keys()
    global_scale = max(float(np.max(np.abs(v))) for v in ref_flat.values()) + 1e-12
    for name, r in ref_flat.items():
        s = sh_flat[name]
        atol = max(2e-3 * (float(np.max(np.abs(r))) + 1e-12), 1e-4 * global_scale)
        np.testing.assert_allclose(s, r, rtol=2e-3, atol=atol, err_msg=name)


@pytest.mark.slow
def test_cvp_mvsnet_hyp_sharded_forward(cpu_devices, rng):
    """cvp_mvsnet under a (data=2, hyp=4) mesh: the coarse 48-hypothesis
    sweep volume and every refinement level's 8-hypothesis volume shard
    over "hyp" (annotations in models/cvp_mvsnet.py); sharded ==
    unsharded."""
    from tests_common import random_pose_np

    model = create_model("cvp_mvsnet", pretrained=False, weights=None, nscale=3)
    B, V, H, W = 2, 3, 64, 64
    images, _, intr, kv = _sample(rng, B, V, H, W)
    intr_abs = intr * jnp.asarray([[W, 1, W], [1, H, H], [1, 1, 1]], jnp.float32)
    poses = np.stack(
        [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))]
        + [np.tile(random_pose_np(rng, 0.1, 0.2), (B, 1, 1)) for _ in range(V - 1)],
        axis=1,
    )
    args = (
        images,
        jnp.asarray(poses),
        intr_abs,
        kv,
        jnp.full((B,), 2.0),
        jnp.full((B,), 10.0),
    )

    fwd = jax.jit(lambda v, *a: model.module.apply(v, *a))
    ref_pred, _ = fwd(model.variables, *args)
    ref_depth = np.asarray(ref_pred["depth"])

    mesh = make_mesh(MeshSpec(data=2, view=1, hyp=4), devices=cpu_devices)
    with use_mesh(mesh):
        sh_pred, _ = jax.jit(lambda v, *a: model.module.apply(v, *a))(
            model.variables, *args
        )
    sh_depth = np.asarray(sh_pred["depth"])

    np.testing.assert_allclose(sh_depth, ref_depth, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_vis_mvsnet_sharded_train_step_grad_equality(cpu_devices, rng):
    """vis_mvsnet train-step gradients (vismvsnet_loss through the full
    cascade) under a (data=2, hyp=4) mesh equal the unsharded gradients —
    sharded-training coverage for the second trainable model
    (SURVEY §2.10)."""
    from robustmvd_tpu.loss import create_loss

    model = create_model(
        "vis_mvsnet", pretrained=False, weights=None, train=True
    )
    loss_obj = create_loss("vismvsnet_loss")

    B, V, H, W = 2, 3, 64, 64
    images, poses, intr, kv = _sample(rng, B, V, H, W)
    intr_abs = intr * jnp.asarray([[W, 1, W], [1, H, H], [1, 1, 1]], jnp.float32)
    depth_range = (jnp.full((B,), 2.0), jnp.full((B,), 10.0))
    gt = {
        "depth": jnp.asarray((2.0 + 7.0 * rng.rand(B, H, W, 1)).astype(np.float32))
    }
    si = {
        "images": images,
        "poses": poses,
        "intrinsics": intr_abs,
        "keyview_idx": kv,
        "depth_range": depth_range,
    }

    def loss_and_grads(variables):
        def loss_fn(params):
            vars_in = dict(variables)
            vars_in["params"] = params
            pred, aux = model.apply_fn(vars_in, **si)
            total, _, _ = loss_obj(si, gt, pred, aux, iteration=0, params=params)
            return total

        return jax.value_and_grad(loss_fn)(variables["params"])

    ref_loss, ref_grads = jax.jit(loss_and_grads)(model.variables)
    ref_loss = float(ref_loss)

    mesh = make_mesh(MeshSpec(data=2, view=1, hyp=4), devices=cpu_devices)
    with use_mesh(mesh):
        sh_loss, sh_grads = jax.jit(loss_and_grads)(model.variables)
    sh_loss = float(sh_loss)

    assert abs(sh_loss - ref_loss) < 1e-3 * abs(ref_loss)

    ref_flat = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(ref_grads)
    }
    sh_flat = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(sh_grads)
    }
    assert ref_flat.keys() == sh_flat.keys()
    global_scale = max(float(np.max(np.abs(v))) for v in ref_flat.values()) + 1e-12
    for name, r in ref_flat.items():
        s = sh_flat[name]
        atol = max(2e-3 * (float(np.max(np.abs(r))) + 1e-12), 1e-4 * global_scale)
        np.testing.assert_allclose(s, r, rtol=2e-3, atol=atol, err_msg=name)
