"""Single-scale masked MAE loss — the MVSNet training loss.

Reference parity (rmvd/loss/single_scale_mae.py:10-130): masked MAE on
depth, bilinear GT resize, optional weighting by the inverse of the depth
sampling interval (:78-89), no weight decay for ``mvsnet_loss``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.interpolate import resize_bilinear, resize_nearest_torch
from .multi_scale_uni_laplace import regularization_l2
from .registry import register_loss
from .utils import mae, pointwise_ae


class SingleScaleMAE:
    def __init__(
        self,
        model=None,
        weight_decay=1e-4,
        gt_interpolation="nearest",
        modality="invdepth",
        weight_by_sampling_interval=False,
        verbose=True,
    ):
        self.name = type(self).__name__
        self.weight_decay = weight_decay
        self.gt_interpolation = gt_interpolation
        self.modality = modality
        self.weight_by_sampling_interval = weight_by_sampling_interval

    def _resize_gt(self, gt, size):
        if self.gt_interpolation == "bilinear":
            return resize_bilinear(gt, size)
        return resize_nearest_torch(gt, size)

    def __call__(self, sample_inputs, sample_gt, pred, aux, iteration, params=None):
        sub_losses = {}
        pointwise_losses = {}

        gt = sample_gt[self.modality]
        gt_mask = gt > 0
        p = aux[self.modality]

        if self.weight_by_sampling_interval:
            # weight = 1 / depth sampling interval (reference :78-89);
            # sampling_invdepths is (N, S[, H, W]) ascending in invdepth.
            sampling_invdepths = aux["sampling_invdepths"]
            steps = sampling_invdepths.shape[1]
            max_depth = 1.0 / sampling_invdepths[:, 0:1, ...]
            min_depth = 1.0 / sampling_invdepths[:, -1:, ...]
            interval = (max_depth - min_depth) / (steps - 1)
            loss_weight = 1.0 / interval
            while loss_weight.ndim < p.ndim:
                loss_weight = loss_weight[..., None]
        else:
            loss_weight = 1.0

        size = p.shape[1:3]
        gt_rs = self._resize_gt(gt, size)
        mask_rs = resize_nearest_torch(gt_mask.astype(gt.dtype), size) == 1.0

        mae_loss = mae(gt=gt_rs, pred=p, mask=mask_rs, weight=loss_weight)
        pw = pointwise_ae(gt=gt_rs, pred=p, mask=mask_rs, weight=loss_weight)

        total_reg = (
            regularization_l2(params, self.weight_decay)
            if (params is not None and self.weight_decay)
            else 0.0
        )

        total = mae_loss + total_reg
        sub_losses["00_mae"] = mae_loss
        sub_losses["01_reg"] = total_reg
        pointwise_losses["0_ae"] = pw
        return total, sub_losses, pointwise_losses


@register_loss
def mvsnet_loss(model=None, **kwargs):
    return SingleScaleMAE(
        model=model,
        weight_decay=0.0,
        gt_interpolation="bilinear",
        modality="depth",
        weight_by_sampling_interval=True,
        **kwargs,
    )
