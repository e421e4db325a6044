"""Vis-MVSNet full-model parity against the reference torch implementation.

Forward: the reference ``VisMvsnet`` (rmvd/models/vis_mvsnet.py:25-186)
state_dict is converted through ``convert_vis_mvsnet_torch_state_dict``
(UNet registry renames + flipped ConvTranspose layouts) and the cascade's
depth maps must agree to fp32 tolerance.

Gradients: torch-autograd gradients of the reference
``VismvnsetMultiscaleMultiviewAggregate`` loss
(rmvd/loss/vismvsnet_multiscale_multiview_aggregate.py:14-220, mode=soft,
occ_guide=False) through the reference model are compared per-parameter
with jax.grad of this framework's loss through the converted weights —
the vis_mvsnet training-path analogue of test_gradient_parity.py. Both
sides run BatchNorm in running-average mode so the comparison isolates
the op chain (the reference's torch training would additionally update
BN statistics; this framework trains with frozen BN, PARITY.md).
"""

import importlib
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
    import torch

    # the reference SingleStage hardcodes .cuda() on its meshgrids
    # (vis_mvsnet_singlestage.py:194,208,227) — no-op it for CPU testing
    torch.Tensor.cuda = lambda self, *a, **k: self
    # the reference UNet uses nn.ReLU(inplace=True) followed by
    # ``out += residual`` (vis_mvsnet_unet_modular.py:29,66), which makes
    # torch's OWN backward fail ("modified by an inplace operation") —
    # the repo never actually trains vis_mvsnet (train_all.sh covers
    # robust_mvd only). Out-of-place ReLU is mathematically identical and
    # lets autograd run for the gradient-parity comparison.
    orig_relu = torch.nn.ReLU

    class _OutOfPlaceReLU(orig_relu):
        def __init__(self, inplace=False):
            super().__init__(inplace=False)

    torch.nn.ReLU = _OutOfPlaceReLU

    # UncertNet.forward's ``out += x`` modifies a ReLU output in place
    # (vis_mvsnet_singlestage.py:69-74) — ReLU backward needs its output,
    # so the reference cannot autograd through itself at all; the
    # out-of-place rewrite is mathematically identical
    sstage = importlib.import_module("rmvd.models.blocks.vis_mvsnet_singlestage")
    orig_uncert_forward = sstage.UncertNet.forward

    def _uncert_forward(self, x):
        out = self.conv1(x)
        out = self.conv2(out)
        out = out + x
        return [conv(out) for conv in self.head_convs]

    sstage.UncertNet.forward = _uncert_forward
    try:
        yield importlib.import_module("rmvd.models.vis_mvsnet")
    finally:
        torch.nn.ReLU = orig_relu
        sstage.UncertNet.forward = orig_uncert_forward


def _make_inputs(rng, B=1, V=3, H=64, W=96):
    from tests_common import random_pose_np

    images = [rng.rand(B, 3, H, W).astype(np.float32) for _ in range(V)]
    K = np.tile(
        np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )
    poses = [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))]
    poses += [
        np.tile(random_pose_np(rng, 0.08, 0.15), (B, 1, 1)) for _ in range(V - 1)
    ]
    depth_range = (
        np.full((B,), 2.0, np.float32),
        np.full((B,), 10.0, np.float32),
    )
    depth = rng.rand(B, 1, H, W).astype(np.float32) * 7.0 + 2.5
    return images, poses, K, depth_range, depth


def _torch_model_and_inputs(reference, images, poses, K, depth_range):
    import torch

    torch.manual_seed(0)
    tmodel = reference.VisMvsnet(num_sampling_steps=64)
    tmodel.eval()
    V = len(images)
    B = images[0].shape[0]
    t_in = dict(
        images=[torch.from_numpy(im) for im in images],
        poses=[torch.from_numpy(p) for p in poses],
        intrinsics=[torch.from_numpy(K) for _ in range(V)],
        keyview_idx=torch.zeros(B, dtype=torch.int64),
        depth_range=(
            torch.from_numpy(depth_range[0]),
            torch.from_numpy(depth_range[1]),
        ),
    )
    return tmodel, t_in


def _jax_model(state, num_sampling_steps=64):
    from robustmvd_tpu.models import create_model
    from robustmvd_tpu.models.weights import convert_vis_mvsnet_torch_state_dict

    m = create_model(
        "vis_mvsnet",
        pretrained=False,
        weights=None,
        num_sampling_steps=num_sampling_steps,
    )
    m.variables = convert_vis_mvsnet_torch_state_dict(state)
    return m


def _jax_inputs(images, poses, K, depth_range):
    import jax.numpy as jnp

    V = len(images)
    B = images[0].shape[0]
    return dict(
        images=jnp.asarray(np.stack(images, 1).transpose(0, 1, 3, 4, 2)),
        poses=jnp.asarray(np.stack(poses, 1)),
        intrinsics=jnp.asarray(np.tile(K[:, None], (1, V, 1, 1))),
        keyview_idx=jnp.zeros((B,), jnp.int32),
        depth_range=(
            jnp.asarray(depth_range[0]),
            jnp.asarray(depth_range[1]),
        ),
    )


@pytest.mark.slow
def test_vis_mvsnet_forward_parity(reference, rng):
    import torch

    images, poses, K, depth_range, _ = _make_inputs(rng)
    tmodel, t_in = _torch_model_and_inputs(reference, images, poses, K, depth_range)
    with torch.no_grad():
        tpred, taux = tmodel(**t_in)
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    m = _jax_model(state)
    jpred, jaux = m.apply_fn(m.variables, **_jax_inputs(images, poses, K, depth_range))

    t_depth = tpred["depth"].numpy()
    j_depth = np.asarray(jpred["depth"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_depth, t_depth, rtol=1e-4, atol=5e-4)

    t_unc = tpred["depth_uncertainty"].numpy()
    j_unc = np.asarray(jpred["depth_uncertainty"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_unc, t_unc, rtol=1e-3, atol=1e-4)

    # per-stage cascade outputs
    for s, (t_est, _) in enumerate(taux["outputs"]):
        j_est = np.asarray(jaux["outputs"][s][0])
        np.testing.assert_allclose(
            j_est, t_est.numpy(), rtol=1e-4, atol=5e-4, err_msg=f"stage {s + 1}"
        )


@pytest.mark.slow
def test_vis_mvsnet_loss_gradient_parity(reference, rng):
    import torch

    images, poses, K, depth_range, depth = _make_inputs(rng)
    B, V = images[0].shape[0], len(images)
    H, W = depth.shape[-2:]

    tmodel, t_in = _torch_model_and_inputs(reference, images, poses, K, depth_range)
    ref_loss_mod = importlib.import_module(
        "rmvd.loss.vismvsnet_multiscale_multiview_aggregate"
    )
    tloss = ref_loss_mod.VismvnsetMultiscaleMultiviewAggregate(model=tmodel)

    tpred, taux = tmodel(**t_in)
    masks = [torch.full((B, 1, H, W), 255.0) for _ in range(V - 1)]
    t_total = tloss(
        sample_inputs={"masks": masks},
        sample_gt={"depth": torch.from_numpy(depth)},
        pred=tpred,
        aux=taux,
        iteration=0,
    )
    if isinstance(t_total, tuple):
        t_total = t_total[0]
    tmodel.zero_grad()
    t_total.backward()
    grads = {
        name: (
            p.grad.detach().numpy()
            if p.grad is not None
            else np.zeros_like(p.detach().numpy())
        )
        for name, p in tmodel.named_parameters()
    }
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from robustmvd_tpu.loss.vismvsnet_multiscale_multiview_aggregate import (
        vismvsnet_loss,
    )
    from robustmvd_tpu.models.weights import convert_vis_mvsnet_torch_state_dict

    m = _jax_model(state)
    ref_grads = convert_vis_mvsnet_torch_state_dict(grads)["params"]
    j_in = _jax_inputs(images, poses, K, depth_range)
    jloss = vismvsnet_loss(max_d=64)
    j_gt = {"depth": jnp.asarray(depth.transpose(0, 2, 3, 1))}
    batch_stats = m.variables["batch_stats"]

    def loss_fn(params):
        pred, aux = m.module.apply(
            {"params": params, "batch_stats": batch_stats}, **j_in
        )
        total, _, _ = jloss(
            sample_inputs={}, sample_gt=j_gt, pred=pred, aux=aux, iteration=0
        )
        return total

    j_total, j_grads = jax.value_and_grad(loss_fn)(m.variables["params"])
    np.testing.assert_allclose(float(j_total), float(t_total.detach()), rtol=1e-4)

    j_flat = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(j_grads)
    }
    r_flat = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(ref_grads)
    }
    assert set(j_flat) == set(r_flat)
    global_scale = max(float(np.max(np.abs(r))) for r in r_flat.values()) + 1e-12
    for name in sorted(r_flat):
        r, j = r_flat[name], j_flat[name]
        assert j.shape == r.shape, name
        scale = float(np.max(np.abs(r))) + 1e-12
        atol = max(2e-3 * scale, 1e-4 * global_scale)
        np.testing.assert_allclose(
            j, r, rtol=2e-3, atol=atol, err_msg=f"grad mismatch at {name}"
        )
