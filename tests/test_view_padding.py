"""View-count bucketing: padded view slots must not change the prediction.

The eval protocol sweeps 1..V source views per sample
(multi_view_depth_evaluation.py:297-329); bucketing pads the view list so
the number of compiled programs stays bounded. Padded views are replicated
real views whose correlation masks are zeroed — results must match the
unpadded forward exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustmvd_tpu.models import create_model
from tests_common import random_pose_np


def _forward(model, images, poses, intrinsics, num_views=None):
    args = dict(
        images=jnp.asarray(images),
        poses=jnp.asarray(poses),
        intrinsics=jnp.asarray(intrinsics),
        keyview_idx=jnp.zeros((1,), jnp.int32),
    )
    if num_views is not None:
        args["num_views"] = jnp.asarray(num_views)
    pred, aux = model.module.apply(model.variables, **args)
    return np.asarray(aux["invdepth"])


@pytest.mark.slow
def test_padded_views_match_unpadded(rng):
    model = create_model("robust_mvd", pretrained=False, weights=None)
    B, H, W = 1, 64, 64
    V_real = 3  # key + 2 sources

    images = rng.rand(B, V_real, H, W, 3).astype(np.float32) - 0.4
    poses = np.stack(
        [np.eye(4, dtype=np.float32)]
        + [random_pose_np(rng, 0.1, 0.2) for _ in range(V_real - 1)]
    )[None]
    intr = np.tile(
        np.array([[0.8, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1]], dtype=np.float32),
        (B, V_real, 1, 1),
    )

    ref = _forward(model, images, poses, intr)

    # pad to 5 views (4 source slots) by replicating the last view
    V_pad = 5
    images_p = np.concatenate(
        [images] + [images[:, -1:]] * (V_pad - V_real), axis=1
    )
    poses_p = np.concatenate([poses] + [poses[:, -1:]] * (V_pad - V_real), axis=1)
    intr_p = np.concatenate([intr] + [intr[:, -1:]] * (V_pad - V_real), axis=1)

    padded = _forward(model, images_p, poses_p, intr_p, num_views=np.array([V_real]))

    np.testing.assert_allclose(padded, ref, atol=1e-5, rtol=1e-4)


def test_input_adapter_buckets_views(rng):
    model = create_model("robust_mvd", pretrained=False, weights=None)
    B, H, W = 1, 64, 64
    for n_src, expected_slots in [(1, 1), (2, 2), (3, 4), (5, 8), (9, 16)]:
        images = [rng.rand(B, 3, H, W).astype(np.float32) * 255 for _ in range(1 + n_src)]
        K = [np.tile(np.eye(3, dtype=np.float32) * 40, (B, 1, 1)) for _ in range(1 + n_src)]
        poses = [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)) for _ in range(1 + n_src)]
        sample = model.input_adapter(
            images=images, keyview_idx=np.array([0]), poses=poses, intrinsics=K
        )
        assert sample["images"].shape[1] == 1 + expected_slots, n_src
        assert int(sample["num_views"][0]) == 1 + n_src
