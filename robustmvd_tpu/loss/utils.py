"""Loss primitives (reference parity: rmvd/loss/utils.py).

All operate on channel-last (N, H, W, 1) maps with optional masks; masked
means divide by the number of valid pixels and return 0 when nothing is
valid (rmvd/loss/utils.py:4-23).
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_mean(pointwise, mask, eps=1e-9):
    if mask is None:
        return jnp.mean(pointwise)
    mask = mask.astype(pointwise.dtype)
    num_valid = jnp.sum(mask)
    total = jnp.sum(pointwise * mask) / (num_valid + eps)
    return jnp.where(num_valid != 0, total, 0.0)


def mae(gt, pred, mask=None, weight=None, eps=1e-9):
    ae = jnp.abs(pred - gt)
    if weight is not None:
        ae = ae * weight
    return _masked_mean(ae, mask, eps)


def pointwise_ae(gt, pred, mask=None, weight=None):
    ae = jnp.abs(pred - gt)
    if mask is not None:
        ae = ae * mask.astype(ae.dtype)
    if weight is not None:
        ae = ae * weight
    return ae


def m_univariate_laplace_nll(gt, pred_a, pred_log_b, mask=None, weight=None, eps=1e-9):
    """Mean Laplacian negative log-likelihood: |e|/b + log b."""
    ae = jnp.abs(pred_a - gt)
    nll = ae / jnp.exp(pred_log_b) + pred_log_b
    if weight is not None:
        nll = nll * weight
    return _masked_mean(nll, mask, eps)


def pointwise_univariate_laplace_nll(gt, pred_a, pred_log_b, mask=None, weight=None):
    ae = jnp.abs(pred_a - gt)
    nll = ae / jnp.exp(pred_log_b) + pred_log_b
    if mask is not None:
        nll = nll * mask.astype(nll.dtype)
    if weight is not None:
        nll = nll * weight
    return nll
