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


def test_cvp_depth_hypo_interval_matches_solve_oracle(rng):
    """The closed-form Cramer solve in cal_depth_hypo_interval equals the
    batched 2x2 np.linalg.solve of the same system (reference:
    cvp_mvsnet_components.py:345-351) within fp32 tolerance."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from robustmvd_tpu.models.blocks.cvp_mvsnet import cal_depth_hypo_interval

    B, H, W = 2, 24, 32
    depths = (1.0 + rng.rand(B, H, W) * 5).astype(np.float32)
    K = np.tile(
        np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]], np.float32), (B, 1, 1)
    )
    ref_ex = np.stack([np.eye(4, dtype=np.float32) for _ in range(B)])
    src_ex = []
    for _ in range(B):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rotation.from_rotvec(rng.randn(3) * 0.1).as_matrix()
        T[:3, 3] = rng.randn(3) * 0.2
        src_ex.append(T)
    src_ex = np.stack(src_ex)

    out = np.asarray(
        cal_depth_hypo_interval(
            jnp.asarray(depths),
            jnp.asarray(K),
            jnp.asarray(K * 1.05),
            jnp.asarray(ref_ex),
            jnp.asarray(src_ex),
        )
    )

    def oracle(depth, rK, sK, rE, sE):
        xx, yy = np.meshgrid(
            np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64),
            indexing="ij",
        )
        X = np.stack([xx.reshape(-1), yy.reshape(-1), np.ones(H * W)], 0)
        D1 = depth.T.reshape(-1).astype(np.float64)
        D2 = D1 + 1
        rKi = np.linalg.inv(rK)
        ray1, ray2 = rKi @ (X * D1), rKi @ (X * D2)
        ones = np.ones((1, H * W))
        X1 = np.linalg.inv(rE) @ np.concatenate([ray1, ones], 0)
        X2 = np.linalg.inv(rE) @ np.concatenate([ray2, ones], 0)
        X1, X2 = (sE @ X1)[:3], (sE @ X2)[:3]
        X1 = sK @ X1
        X1_d = X1[2]
        X1 = X1 / X1_d
        X2 = sK @ X2
        X2 = X2 / X2[2]
        k = (X2[1] - X1[1]) / (X2[0] - X1[0])
        th = np.arctan(k)
        X3 = X1 + np.stack([np.cos(th), np.sin(th), np.zeros_like(th)], 0)
        A = rK @ rE[:3, :3] @ np.linalg.inv(sK @ sE[:3, :3])
        tmp1, tmp2 = X1_d * (A @ X1), A @ X3
        M1 = np.stack([X.T[:, 1:], tmp2.T[:, 1:]], 2)
        ans = np.linalg.solve(M1, tmp1.T[:, 1:, None])
        return np.mean(np.abs(ans[:, 0, 0]))

    for b in range(B):
        expect = oracle(
            depths[b],
            K[b].astype(np.float64),
            (K[b] * 1.05).astype(np.float64),
            ref_ex[b].astype(np.float64),
            src_ex[b].astype(np.float64),
        )
        np.testing.assert_allclose(out[b], expect, rtol=1e-3)
