"""Multi-scale univariate-Laplacian NLL loss — the robust_mvd training loss.

Reference parity (rmvd/loss/multi_scale_uni_laplace.py:15-158):
- per-scale masked loss on inverse depth scaled by ``mean_scaling_factor``
  (1050 for robust_mvd_loss);
- plain MAE for the first ``deterministic_loss_iterations`` (2000) steps,
  then Laplacian NLL ``|e|/b + log b``;
- scale weights ``100 * [1/16, 1/16, 1/16, 1/8, 1/4, 1/2, 1]`` zipped
  against the decoder's coarse-to-fine predictions;
- manual L2 weight decay 1e-4 on parameters that are not prediction heads,
  not biases and not norm scales (reference:get_regularization_parameters,
  :58-77);
- ground truth is nearest-downsampled (torch floor-convention) per scale.

The warmup switch is implemented branch-free (both losses are elementwise
and cheap next to the forward pass) so the train step stays one compiled
program across the 2000-iteration boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.interpolate import resize_nearest_torch
from .registry import register_loss
from .utils import (
    m_univariate_laplace_nll,
    mae,
    pointwise_ae,
    pointwise_univariate_laplace_nll,
)


def regularization_l2(params, weight_decay):
    """Sum of 0.5*||w||^2 over conv kernels outside prediction heads.

    Mirrors the reference's filter (multi_scale_uni_laplace.py:58-77):
    exclude any parameter whose path contains "pred", all biases, and all
    norm scales.
    """

    def is_reg(path, leaf):
        names = [
            p.key if hasattr(p, "key") else str(p) for p in path
        ]
        joined = "/".join(names).lower()
        if "pred" in joined:
            return False
        leaf_name = names[-1] if names else ""
        if leaf_name in ("bias", "scale", "mean", "var"):
            return False
        return True

    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if is_reg(path, leaf):
            total = total + jnp.sum(leaf * leaf) / 2.0
    return total * weight_decay


class MultiScaleUniLaplace:
    def __init__(
        self,
        model=None,
        weight_decay=1e-4,
        gt_interpolation="nearest",
        modality="invdepth",
        deterministic_loss_iterations=2000,
        mean_scaling_factor=1,
        verbose=True,
    ):
        self.name = type(self).__name__
        self.weight_decay = weight_decay
        self.gt_interpolation = gt_interpolation
        self.modality = modality
        self.deterministic_loss_iterations = deterministic_loss_iterations
        self.mean_scaling_factor = mean_scaling_factor
        self.loss_weights = [100 * w for w in (1 / 16, 1 / 16, 1 / 16, 1 / 8, 1 / 4, 1 / 2, 1)]

    def __call__(self, sample_inputs, sample_gt, pred, aux, iteration, params=None):
        """Returns (total_loss, sub_losses, pointwise_losses).

        gt maps are channel-last (N, H, W, 1); aux carries the decoder's
        ``{modality}s_all`` / ``{modality}_log_bs_all`` coarse-to-fine lists.
        """
        sub_losses = {}
        pointwise_losses = {}

        gt = sample_gt[self.modality] * self.mean_scaling_factor
        gt_mask = gt > 0

        preds_all = [x * self.mean_scaling_factor for x in aux[f"{self.modality}s_all"]]
        pred_log_bs_all = aux[f"{self.modality}_log_bs_all"]

        deterministic = iteration < self.deterministic_loss_iterations

        total_mnll = 0.0
        for level, (p, log_b) in enumerate(zip(preds_all, pred_log_bs_all)):
            size = p.shape[1:3]
            gt_rs = resize_nearest_torch(gt, size)
            mask_rs = resize_nearest_torch(gt_mask.astype(gt.dtype), size) == 1.0
            w = self.loss_weights[level]

            loss_mae = mae(gt=gt_rs, pred=p, mask=mask_rs, weight=w)
            loss_nll = m_univariate_laplace_nll(
                gt=gt_rs, pred_a=p, pred_log_b=log_b, mask=mask_rs, weight=w
            )
            loss = jnp.where(deterministic, loss_mae, loss_nll)

            pw_mae = pointwise_ae(gt=gt_rs, pred=p, mask=mask_rs, weight=w)
            pw_nll = pointwise_univariate_laplace_nll(
                gt=gt_rs, pred_a=p, pred_log_b=log_b, mask=mask_rs, weight=w
            )
            pointwise = jnp.where(deterministic, pw_mae, pw_nll)

            sub_losses[f"02_mnll/level_{level}"] = loss
            pointwise_losses[f"00_nll/level_{level}"] = pointwise
            total_mnll = total_mnll + loss

        total_reg = (
            regularization_l2(params, self.weight_decay) if params is not None else 0.0
        )

        total = total_mnll + total_reg
        sub_losses["00_total_mnll"] = total_mnll
        sub_losses["01_reg"] = total_reg
        return total, sub_losses, pointwise_losses


@register_loss
def robust_mvd_loss(model=None, **kwargs):
    return MultiScaleUniLaplace(
        model=model,
        weight_decay=1e-4,
        gt_interpolation="nearest",
        modality="invdepth",
        deterministic_loss_iterations=2000,
        mean_scaling_factor=1050,
        **kwargs,
    )
