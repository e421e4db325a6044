"""soft_argmin / entropy / groupwise_correlation vs torch oracles

(reference: rmvd/models/blocks/utils.py:51-88)."""

import numpy as np
import torch

import jax.numpy as jnp

from robustmvd_tpu.ops.reductions import (
    depth_regression,
    entropy,
    groupwise_correlation,
    soft_argmin,
)


def torch_soft_argmin(volume, dim, keepdim=False, window=None):
    prob_vol = torch.nn.Softmax(dim=dim)(volume)
    length = volume.size()[dim]
    index = torch.arange(0, length, dtype=prob_vol.dtype)
    index_shape = [length if i == dim else 1 for i in range(len(volume.size()))]
    index = index.reshape(index_shape)
    out = torch.sum(index * prob_vol, dim=dim, keepdim=True)
    out_sq = out.squeeze(dim) if not keepdim else out
    if window is None:
        return prob_vol, out_sq
    mask = ((index - out).abs() <= window).to(volume.dtype)
    prob_map = torch.sum(prob_vol * mask, dim=dim, keepdim=keepdim)
    return prob_vol, out_sq, prob_map


def test_soft_argmin(rng):
    vol = rng.randn(2, 7, 5, 6).astype(np.float32)
    prob, out = soft_argmin(jnp.asarray(vol), axis=1)
    tprob, tout = torch_soft_argmin(torch.from_numpy(vol), dim=1)
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), tout.numpy(), atol=1e-5)


def test_soft_argmin_window(rng):
    vol = rng.randn(1, 9, 4, 4).astype(np.float32)
    prob, out, pm = soft_argmin(jnp.asarray(vol), axis=1, window=2)
    tprob, tout, tpm = torch_soft_argmin(torch.from_numpy(vol), dim=1, window=2)
    np.testing.assert_allclose(np.asarray(pm), tpm.numpy(), atol=1e-5)


def test_entropy(rng):
    vol = rng.rand(2, 6, 3, 3).astype(np.float32)
    vol /= vol.sum(1, keepdims=True)
    ours = entropy(jnp.asarray(vol), axis=1)
    tvol = torch.from_numpy(vol)
    theirs = torch.sum(-tvol * tvol.clamp(1e-9, 1.0).log(), dim=1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


def test_groupwise_correlation(rng):
    v1 = rng.randn(2, 5, 5, 16).astype(np.float32)
    v2 = rng.randn(2, 5, 5, 16).astype(np.float32)
    ours = groupwise_correlation(jnp.asarray(v1), jnp.asarray(v2), groups=4, axis=-1)
    # oracle: per-group sum of products
    expected = (v1.reshape(2, 5, 5, 4, 4) * v2.reshape(2, 5, 5, 4, 4)).sum(-1)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_depth_regression(rng):
    prob = rng.rand(2, 4, 4, 8).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    depths = np.linspace(1, 10, 8, dtype=np.float32)[None].repeat(2, 0)
    ours = depth_regression(jnp.asarray(prob), jnp.asarray(depths), axis=-1)
    expected = (prob * depths[:, None, None, :]).sum(-1)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)
