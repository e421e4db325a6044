"""Numerical parity of flax blocks with their torch counterparts, including

the weight conversion path (robustmvd_tpu/models/weights.py). This is the
main parity gate for importing the reference's pretrained robust_mvd
checkpoints (rmvd/models/robust_mvd.py:139-158)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from robustmvd_tpu.models.blocks.dispnet import (
    ConvLReLU,
    DeconvLReLU,
    PredBlock,
)
from robustmvd_tpu.models.weights import convert_torch_state_dict


def _flax_variables_from(tmodule, prefix):
    state = {f"{prefix}.{k}": v.detach().numpy() for k, v in tmodule.state_dict().items()}
    return convert_torch_state_dict(state)


def test_conv_lrelu_matches_torch(rng):
    x = rng.randn(2, 9, 11, 5).astype(np.float32)

    for k, s in [(7, 2), (5, 2), (3, 1), (1, 1)]:
        tconv = nn.Sequential(
            nn.Conv2d(5, 8, kernel_size=k, stride=s, padding=(k - 1) // 2, bias=True),
            nn.LeakyReLU(0.2),
        )
        with torch.no_grad():
            nn.init.normal_(tconv[0].weight)
            nn.init.normal_(tconv[0].bias)

        variables = _flax_variables_from(tconv, "block")
        fconv = ConvLReLU(8, kernel_size=k, stride=s, name="block")
        ours = fconv.apply(
            {"params": variables["params"]["block"]}, jnp.asarray(x)
        )
        theirs = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
        )


def test_deconv_matches_torch(rng):
    x = rng.randn(1, 5, 7, 6).astype(np.float32)
    tdeconv = nn.Sequential(
        nn.ConvTranspose2d(6, 4, kernel_size=4, stride=2, padding=1, bias=True),
        nn.LeakyReLU(0.2),
    )
    with torch.no_grad():
        nn.init.normal_(tdeconv[0].weight)
        nn.init.normal_(tdeconv[0].bias)

    variables = _flax_variables_from(tdeconv, "deconv_1")
    fdeconv = DeconvLReLU(4, name="deconv_1")
    ours = fdeconv.apply(
        {"params": variables["params"]["deconv_1"]}, jnp.asarray(x)
    )
    theirs = tdeconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    assert np.asarray(ours).shape == theirs.transpose(0, 2, 3, 1).shape
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


def test_pred_block_matches_torch_relu_and_sigmoid(rng):
    """pred head: conv -> [ReLU(ch0), sigmoid(ch1*0.2)*20-10]

    (reference: dispnet_decoder.py:17-23 + blocks/utils.py:30-45)."""
    x = rng.randn(1, 6, 6, 10).astype(np.float32)
    tconv = nn.Conv2d(10, 2, kernel_size=3, stride=1, padding=1, bias=True)
    with torch.no_grad():
        nn.init.normal_(tconv.weight)
        nn.init.normal_(tconv.bias)

    state = {f"pred_0.conv.{k}": v.detach().numpy() for k, v in tconv.state_dict().items()}
    variables = convert_torch_state_dict(state)
    ours = PredBlock(name="pred_0").apply(
        {"params": variables["params"]["pred_0"]}, jnp.asarray(x)
    )

    ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    c0 = torch.relu(ty[:, :1])
    c1 = torch.sigmoid(ty[:, 1:] * (4 / 20.0)) * 20.0 - 10.0
    theirs = torch.cat([c0, c1], 1).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4, rtol=1e-4)
