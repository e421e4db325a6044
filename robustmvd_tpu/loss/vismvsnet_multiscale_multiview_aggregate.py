"""Vis-MVSNet training loss: per-stage L1 (scaled by the depth interval) +

per-pair L1 + uncertainty loss ``err*exp(-u) + u`` (+ optional occlusion
logistic loss), stage weights [0.5, 1.0, 2.0]
(reference parity: rmvd/loss/vismvsnet_multiscale_multiview_aggregate.py:14-220).

Maps here are (B, 1, h, w) channel-first (the cascade's native layout);
ground truth arrives channel-last from the training engine and is
transposed once. Boolean-index means become masked means.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.interpolate import resize_bilinear, resize_nearest_torch
from .registry import register_loss


def _masked_mean(x, mask, eps=1e-9):
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / (jnp.sum(mask) + eps)


def _resize_map(x, size, mode="bilinear"):
    # (B, 1, h, w) -> (B, 1, *size)
    x = jnp.transpose(x, (0, 2, 3, 1))
    if mode == "bilinear":
        x = resize_bilinear(x, size)
    else:
        x = resize_nearest_torch(x, size)
    return jnp.transpose(x, (0, 3, 1, 2))


class VismvnsetMultiscaleMultiviewAggregate:
    def __init__(self, model=None, max_d=192, mode="soft", occ_guide=False):
        self.name = type(self).__name__
        self.max_d = max_d
        self.mode = mode
        self.occ_guide = occ_guide

    def __call__(self, sample_inputs, sample_gt, pred, aux, iteration, params=None):
        outputs = aux["outputs"]
        gt = sample_gt["depth"]
        if gt.ndim == 4 and gt.shape[-1] == 1:  # channel-last -> (B, 1, H, W)
            gt = jnp.transpose(gt, (0, 3, 1, 2))

        ref_cam = aux["ref_cam"]
        depth_start = ref_cam[:, 1:2, 3:4, 0:1]
        depth_interval = ref_cam[:, 1:2, 3:4, 1:2]
        depth_end = depth_start + (self.max_d - 2) * depth_interval

        stage_losses = []
        sub_losses = {}

        for stage_idx, (est_depth, pair_results) in enumerate(outputs):
            size = est_depth.shape[2:4]
            gt_ds = _resize_map(gt, size, "bilinear")
            in_range = (gt_ds >= depth_start) & (gt_ds <= depth_end)
            valid = in_range

            interm_size = pair_results[0][0].shape[2:4]
            if interm_size == size:
                gt_interm = gt_ds
                in_range_interm = in_range
            else:
                gt_interm = _resize_map(gt, interm_size, "bilinear")
                in_range_interm = (gt_interm >= depth_start) & (gt_interm <= depth_end)

            abs_err_scaled = jnp.abs(est_depth - gt_ds) / depth_interval
            l1 = _masked_mean(abs_err_scaled, valid)

            pair_l1_losses = []
            uncert_losses = []
            for est, heads in pair_results:
                uncert = heads[0]
                err_scaled = jnp.abs(est - gt_interm) / depth_interval
                pair_l1_losses.append(_masked_mean(err_scaled, in_range_interm))
                if self.mode in ("soft", "hard", "uwta"):
                    uncert_losses.append(
                        _masked_mean(
                            err_scaled * jnp.exp(-uncert) + uncert, in_range_interm
                        )
                    )

            pair_loss = sum(pair_l1_losses) / len(pair_l1_losses)
            if uncert_losses:
                pair_loss = pair_loss + sum(uncert_losses) / len(uncert_losses)

            loss = l1 + pair_loss
            stage_losses.append(loss)
            sub_losses[f"stage{stage_idx + 1}/l1"] = l1
            sub_losses[f"stage{stage_idx + 1}/pair"] = pair_loss

        total = stage_losses[0] * 0.5 + stage_losses[1] * 1.0 + stage_losses[2] * 2.0
        sub_losses["00_total"] = total
        return total, sub_losses, {}


@register_loss
def vismvsnet_loss(model=None, **kwargs):
    return VismvnsetMultiscaleMultiviewAggregate(model=model, **kwargs)


# register under the reference's class-style name as well
from .registry import _registry as _loss_registry  # noqa: E402

_loss_registry.register(
    lambda model=None, **kwargs: VismvnsetMultiscaleMultiviewAggregate(model=model, **kwargs),
    name="VismvnsetMultiscaleMultiviewAggregate",
)
