"""Loss semantics vs hand-computed values and the reference formulas."""

import numpy as np
import pytest

import jax.numpy as jnp

from robustmvd_tpu.loss import create_loss
from robustmvd_tpu.loss.utils import m_univariate_laplace_nll, mae


def test_mae_masked_mean():
    gt = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    pred = jnp.asarray([[1.5, 2.0], [2.0, 4.0]])
    mask = jnp.asarray([[True, True], [False, True]])
    # |0.5| + |0| + |0| over 3 valid = 1/6
    assert float(mae(gt, pred, mask)) == pytest.approx(0.5 / 3)
    # empty mask -> 0 (reference: loss/utils.py:22-23)
    assert float(mae(gt, pred, jnp.zeros_like(mask))) == 0.0


def test_laplace_nll_value():
    gt = jnp.asarray([[2.0]])
    pred = jnp.asarray([[3.0]])
    log_b = jnp.asarray([[0.5]])
    # |e|/b + log b = 1/exp(0.5) + 0.5
    expected = 1 / np.exp(0.5) + 0.5
    assert float(
        m_univariate_laplace_nll(gt, pred, log_b, jnp.asarray([[True]]))
    ) == pytest.approx(expected, rel=1e-6)


def test_robust_mvd_loss_warmup_switch(rng):
    """Before 2000 iterations the loss is MAE; after, Laplacian NLL

    (reference: multi_scale_uni_laplace.py:100-128)."""
    loss = create_loss("robust_mvd_loss")
    H = W = 16
    gt = {"invdepth": jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32) * 0.5 + 0.1)}
    preds = [jnp.asarray(rng.rand(1, H // f, W // f, 1).astype(np.float32))
             for f in (16, 8, 4, 2, 2, 1)]
    log_bs = [jnp.ones_like(p) * 0.7 for p in preds]
    aux = {"invdepths_all": preds, "invdepth_log_bs_all": log_bs}

    t_warm, _, _ = loss({}, gt, {}, aux, iteration=jnp.asarray(0))
    t_nll, _, _ = loss({}, gt, {}, aux, iteration=jnp.asarray(3000))
    assert float(t_warm) != pytest.approx(float(t_nll))
    assert np.isfinite(float(t_warm)) and np.isfinite(float(t_nll))


def test_regularization_filter():
    """L2 applies to conv kernels outside pred heads only

    (reference: multi_scale_uni_laplace.py:58-77)."""
    from robustmvd_tpu.loss.multi_scale_uni_laplace import regularization_l2

    params = {
        "encoder": {"conv1": {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}}},
        "decoder": {"pred_0": {"conv": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones(3)}}},
        "bn": {"scale": jnp.ones(4), "mean": jnp.ones(4)},
    }
    reg = float(regularization_l2(params, weight_decay=1.0))
    # only encoder kernel counts: 4 * 1 / 2 = 2
    assert reg == pytest.approx(2.0)


def test_sl1_loss_torch_parity(rng):
    """SL1Loss matches torch F.smooth_l1_loss with bilinear GT resize

    (reference: rmvd/loss/mvsnet_sl1.py:17-28)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    B, H, W = 2, 8, 12
    pred_np = rng.rand(B, H, W, 1).astype(np.float32) * 5
    gt_np = rng.rand(B, 2 * H, 2 * W, 1).astype(np.float32) * 5
    gt_np[0, :4] = 0.0  # invalid region

    loss_fn = create_loss("SL1Loss", model=None)
    total, _, _ = loss_fn(
        sample_inputs={},
        sample_gt={"depth": jnp.asarray(gt_np)},
        pred={"depth": jnp.asarray(pred_np)},
        aux={},
        iteration=0,
    )

    inputs = torch.from_numpy(pred_np.transpose(0, 3, 1, 2))
    targets = torch.from_numpy(gt_np.transpose(0, 3, 1, 2))
    masks = targets > 0
    targets_rs = F.interpolate(targets, size=(H, W), mode="bilinear", align_corners=False)
    masks_rs = F.interpolate(masks.float(), size=(H, W), mode="nearest") > 0.5
    expected = F.smooth_l1_loss(inputs[masks_rs], targets_rs[masks_rs]).item()

    assert np.isclose(float(total), expected, rtol=1e-5, atol=1e-6)
