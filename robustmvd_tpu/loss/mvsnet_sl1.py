"""Smooth-L1 depth loss (the MVSNet-PL training loss).

Reference parity (rmvd/loss/mvsnet_sl1.py:7-28): masked smooth-L1 (huber
with beta=1) between predicted and GT depth; the GT is resized bilinearly
(align_corners=False) to the prediction size and the validity mask with
nearest interpolation, thresholded at 0.5. Channel layout here is NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.interpolate import resize_bilinear, resize_nearest_torch
from .registry import register_loss


def smooth_l1(x):
    """torch F.smooth_l1_loss elementwise with beta=1."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


class SL1Loss:
    def __init__(self, model=None, verbose=True):
        self.name = type(self).__name__

    def __call__(self, sample_inputs, sample_gt, pred, aux, iteration, params=None):
        p = pred["depth"]
        gt = sample_gt["depth"]

        masks = sample_inputs.get("masks")
        if masks is None:
            masks = (gt > 0).astype(gt.dtype)
        else:
            masks = jnp.asarray(masks).astype(gt.dtype)
            if masks.ndim == 3:
                masks = masks[..., None]

        size = p.shape[1:3]
        gt = resize_bilinear(gt, size)
        masks = resize_nearest_torch(masks, size) > 0.5

        diff = smooth_l1(p - gt) * masks
        denom = jnp.maximum(jnp.sum(masks), 1.0)
        loss = jnp.sum(diff) / denom
        return loss, {}, {}


# registered under the reference's class-style name (rmvd registers the
# class itself, so the entrypoint is "SL1Loss")
@register_loss(name="SL1Loss")
def _sl1_loss(model=None, **kwargs):
    return SL1Loss(model=model, **kwargs)
