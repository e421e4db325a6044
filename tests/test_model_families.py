"""vis_mvsnet and cvp_mvsnet forward smoke tests (tiny shapes)."""

import numpy as np
import pytest

from robustmvd_tpu.models import create_model, list_models


def _make_sample(rng, B, V, H, W, f=80.0, general_poses=False):
    images = [rng.rand(B, 3, H, W).astype(np.float32) * 255 for _ in range(V)]
    K = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], dtype=np.float32)
    Ks = [K.copy() for _ in range(V)]
    if general_poses:
        # general rotations+translations: the reference's CVP epipolar
        # interval solve is singular for pure-axis translations
        from tests_common import random_pose_np

        poses = [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))]
        poses += [
            np.tile(random_pose_np(rng, 0.1, 0.2), (B, 1, 1)) for _ in range(V - 1)
        ]
    else:
        poses = [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)) for _ in range(V)]
        for i in range(1, V):
            poses[i][:, 0, 3] = 0.1 * i
    return images, Ks, poses


def test_families_registered():
    models = list_models()
    assert "vis_mvsnet" in models
    assert "cvp_mvsnet" in models
    assert "vis_mvsnet" in list_models(trainable_only=True)
    assert "cvp_mvsnet" not in list_models(trainable_only=True)


@pytest.mark.slow
def test_vis_mvsnet_forward(rng):
    model = create_model("vis_mvsnet", pretrained=False, weights=None, num_sampling_steps=32)
    B, V, H, W = 1, 3, 64, 64
    images, Ks, poses = _make_sample(rng, B, V, H, W)
    pred, aux = model.run(
        images=images,
        keyview_idx=np.array([0]),
        poses=poses,
        intrinsics=Ks,
        depth_range=(np.array([2.0]), np.array([10.0])),
    )
    # stage 3 output at 1/2 resolution
    assert pred["depth"].shape == (B, 1, H // 2, W // 2)
    assert np.isfinite(pred["depth"]).all()
    assert pred["depth_uncertainty"].shape == (B, 1, H // 2, W // 2)
    assert len(aux["prob_maps"]) == 3


@pytest.mark.slow
def test_cvp_mvsnet_forward(rng):
    model = create_model("cvp_mvsnet", pretrained=False, weights=None, nscale=3)
    B, V, H, W = 1, 3, 64, 64
    images, Ks, poses = _make_sample(rng, B, V, H, W, general_poses=True)
    pred, aux = model.run(
        images=images,
        keyview_idx=np.array([0]),
        poses=poses,
        intrinsics=Ks,
        depth_range=(np.array([2.0]), np.array([10.0])),
    )
    assert pred["depth"].shape == (B, 1, H, W)
    assert np.isfinite(pred["depth"]).all()
    assert len(aux["depths_all"]) == 3
