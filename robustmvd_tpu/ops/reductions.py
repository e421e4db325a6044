"""Hypothesis-axis reductions: soft-argmin, entropy, groupwise correlation.

These are the fused "read out a depth from a probability volume" ops
(reference: rmvd/models/blocks/utils.py:51-88 `soft_argmin`/`entropy`/
`groupwise_correlation`, rmvd/models/blocks/utils.py:271-274
`depth_regression`). All operate on channel-last volumes and are written so
XLA fuses the softmax, expectation and window mask into one pass over the
hypothesis axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_argmin(volume, axis, keepdims=False, window=None):
    """Softmax-expectation index regression over ``axis``.

    Returns (prob_volume, expected_index[, windowed_prob_mass]) exactly like
    the reference (blocks/utils.py:51-64): the expectation is over hypothesis
    *indices*; with ``window`` the probability mass within +-window of the
    expectation is also returned.
    """
    prob = jax.nn.softmax(volume, axis=axis)
    length = volume.shape[axis]
    index_shape = [length if i == (axis % volume.ndim) else 1 for i in range(volume.ndim)]
    index = jnp.arange(length, dtype=prob.dtype).reshape(index_shape)
    out = jnp.sum(index * prob, axis=axis, keepdims=True)
    out_sq = out if keepdims else jnp.squeeze(out, axis=axis)
    if window is None:
        return prob, out_sq
    mask = (jnp.abs(index - out) <= window).astype(volume.dtype)
    prob_map = jnp.sum(prob * mask, axis=axis, keepdims=keepdims)
    return prob, out_sq, prob_map


def entropy(prob_volume, axis, keepdims=False):
    """Shannon entropy of a probability volume along ``axis``

    (reference: blocks/utils.py:67-68, clamp to [1e-9, 1]).
    """
    p = jnp.clip(prob_volume, 1e-9, 1.0)
    return jnp.sum(-prob_volume * jnp.log(p), axis=axis, keepdims=keepdims)


def groupwise_correlation(v1, v2, groups, axis):
    """Group-wise channel correlation: split channels into ``groups`` and

    average-free dot within each group (reference: blocks/utils.py:71-88 —
    note the reference *sums* within groups, no normalization).
    """
    axis = axis % v1.ndim
    c = v1.shape[axis]
    assert c % groups == 0

    def regroup(v):
        shape = list(v.shape)
        new_shape = shape[:axis] + [groups, c // groups] + shape[axis + 1 :]
        return v.reshape(new_shape)

    return jnp.sum(regroup(v1) * regroup(v2), axis=axis + 1)


def depth_regression(prob, depth_values, axis=-1):
    """Expected depth under a probability volume.

    prob: (..., D) probabilities along ``axis``; depth_values: (B, D) or
    broadcastable. (reference: blocks/utils.py:271-274 — there the volume is
    (B, D, H, W); here channel-last.)
    """
    prob_moved = jnp.moveaxis(prob, axis, -1)
    while depth_values.ndim < prob_moved.ndim:
        depth_values = depth_values[:, None]
    return jnp.sum(prob_moved * depth_values, axis=-1)
