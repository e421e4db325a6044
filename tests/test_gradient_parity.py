"""Gradient parity against the reference implementation.

torch-autograd gradients of the reference ``MultiScaleUniLaplace`` loss
through the reference RobustMVD model are compared per-parameter with
jax.grad of this framework's loss through the converted weights — the
training-path analogue of the full-model forward parity test.

Covers both loss phases (reference:
rmvd/loss/multi_scale_uni_laplace.py:79-146):
- iteration < 2000: plain masked MAE warmup,
- iteration >= 2000: Laplacian NLL |e|/b + log b,
plus the manual L2 weight-decay term over the reference's parameter filter
(:58-77) — a mismatch in the regularized-parameter set would show up as a
wd*param offset on exactly the disagreeing leaves.
"""

import os.path as osp
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not osp.isdir(REF), reason="reference unavailable")


@pytest.fixture(scope="module")
def reference():
    from tests_common import install_reference_stubs

    install_reference_stubs()
    import rmvd.loss.multi_scale_uni_laplace  # noqa: F401
    import rmvd.models.robust_mvd  # noqa: F401

    return sys.modules["rmvd"]


def _make_inputs(rng, B, V, H, W):
    from tests_common import random_pose_np

    images = np.stack(
        [rng.rand(B, 3, H, W).astype(np.float32) - 0.4 for _ in range(V)], axis=1
    )  # (B, V, 3, H, W)
    K_rel = np.array([[0.9, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], dtype=np.float32)
    intrinsics = np.tile(K_rel, (B, V, 1, 1))
    poses = [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))]
    poses += [np.tile(random_pose_np(rng, 0.1, 0.2), (B, 1, 1)) for _ in range(V - 1)]
    poses = np.stack(poses, axis=1)
    depth = rng.rand(B, 1, H, W).astype(np.float32) * 8.0 + 2.0
    invdepth = (1.0 / depth).astype(np.float32)
    # punch some invalid-GT holes to exercise the mask path
    invdepth[:, :, :: 7, :: 5] = 0.0
    return images, poses, intrinsics, invdepth


def _torch_grads(reference, images, poses, intrinsics, invdepth, iteration):
    import torch

    ref_models = sys.modules["rmvd.models.robust_mvd"]
    ref_loss_mod = sys.modules["rmvd.loss.multi_scale_uni_laplace"]

    torch.manual_seed(0)
    tmodel = ref_models.RobustMVD()
    tmodel.train()
    tloss = ref_loss_mod.robust_mvd_loss(model=tmodel, verbose=False)

    B, V = images.shape[:2]
    t_images = [torch.from_numpy(images[:, v]) for v in range(V)]
    t_poses = [torch.from_numpy(poses[:, v]) for v in range(V)]
    t_K = [torch.from_numpy(intrinsics[:, v]) for v in range(V)]

    pred, aux = tmodel(
        images=t_images, poses=t_poses, intrinsics=t_K, keyview_idx=0
    )
    total, _, _ = tloss(
        sample_inputs={},
        sample_gt={"invdepth": torch.from_numpy(invdepth)},
        pred=pred,
        aux=aux,
        iteration=iteration,
    )
    tmodel.zero_grad()
    total.backward()
    grads = {
        name: p.grad.detach().numpy() if p.grad is not None else np.zeros_like(p.detach().numpy())
        for name, p in tmodel.named_parameters()
    }
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    return float(total.detach()), grads, state


def _jax_value_and_grads(state_dict, grads_dict, images, poses, intrinsics, invdepth, iteration):
    import jax
    import jax.numpy as jnp

    from robustmvd_tpu.loss.multi_scale_uni_laplace import robust_mvd_loss
    from robustmvd_tpu.models.robust_mvd import RobustMVDModule
    from robustmvd_tpu.models.weights import convert_torch_state_dict

    variables = convert_torch_state_dict(state_dict)
    # torch grads converted through the SAME name/layout mapping as the
    # weights -> directly comparable to the jax grad tree
    ref_grads = convert_torch_state_dict(grads_dict)["params"]

    module = RobustMVDModule()
    jloss = robust_mvd_loss(verbose=False)

    B = images.shape[0]
    j_images = jnp.asarray(images.transpose(0, 1, 3, 4, 2))
    j_poses = jnp.asarray(poses)
    j_K = jnp.asarray(intrinsics)
    j_key = jnp.zeros((B,), jnp.int32)
    j_gt = {"invdepth": jnp.asarray(invdepth.transpose(0, 2, 3, 1))}

    def loss_fn(params):
        pred, aux = module.apply({"params": params}, j_images, j_poses, j_K, j_key)
        total, _, _ = jloss(
            sample_inputs={},
            sample_gt=j_gt,
            pred=pred,
            aux=aux,
            iteration=iteration,
            params=params,
        )
        return total

    total, grads = jax.value_and_grad(loss_fn)(variables["params"])
    return float(total), jax.tree.map(np.asarray, grads), ref_grads


def _assert_grad_trees_match(jax_grads, ref_grads):
    import jax

    j_flat = dict(jax.tree_util.tree_leaves_with_path(jax_grads))
    r_flat = dict(jax.tree_util.tree_leaves_with_path(ref_grads))
    j_paths = {jax.tree_util.keystr(p) for p in j_flat}
    r_paths = {jax.tree_util.keystr(p) for p in r_flat}
    assert j_paths == r_paths, (j_paths ^ r_paths)

    j_by_name = {jax.tree_util.keystr(p): v for p, v in j_flat.items()}
    r_by_name = {jax.tree_util.keystr(p): v for p, v in r_flat.items()}
    # leaves whose whole gradient sits at the fp32 noise floor (e.g. biases
    # behind the softmax fusion, ~1e-6) are compared against a global scale
    global_scale = max(float(np.max(np.abs(r))) for r in r_by_name.values()) + 1e-12
    for name, r in sorted(r_by_name.items()):
        j = j_by_name[name]
        assert j.shape == r.shape, name
        scale = float(np.max(np.abs(r))) + 1e-12
        atol = max(2e-3 * scale, 1e-4 * global_scale)
        np.testing.assert_allclose(
            j, r, rtol=2e-3, atol=atol, err_msg=f"grad mismatch at {name}"
        )


@pytest.mark.slow
@pytest.mark.parametrize("iteration", [0, 5000], ids=["mae-warmup", "laplace-nll"])
def test_robust_mvd_loss_gradient_parity(reference, rng, iteration):
    images, poses, intrinsics, invdepth = _make_inputs(rng, B=1, V=3, H=64, W=128)

    t_total, t_grads, state = _torch_grads(
        reference, images, poses, intrinsics, invdepth, iteration
    )
    j_total, j_grads, ref_grads = _jax_value_and_grads(
        state, t_grads, images, poses, intrinsics, invdepth, iteration
    )

    np.testing.assert_allclose(j_total, t_total, rtol=1e-4)
    _assert_grad_trees_match(j_grads, ref_grads)
