"""Executed coverage for the wrapped-model adapters.

The external repos (monodepth2, MiDaS, Vis-MVSNet, mvsnet_pl, CVP-MVSNet,
PatchmatchNet) are not present in CI, so the original networks are replaced
with tiny fakes that match each repo's calling convention — everything the
wrapper itself owns (input resizing/normalization, cam-tensor packing,
projection-matrix math, disp->depth conversion, batch-dim plumbing,
output_adapter) runs for real on numpy/torch-CPU, with numeric assertions
on the adapter math (reference parity: rmvd/models/wrappers/*.py).
"""

import numpy as np
import pytest
import torch

from robustmvd_tpu.models.wrappers.cvp_mvsnet import CVPMVSNetWrapped
from robustmvd_tpu.models.wrappers.midas import MidasWrapped
from robustmvd_tpu.models.wrappers.monodepth2 import Monodepth2Wrapped
from robustmvd_tpu.models.wrappers.mvsnet_pl import MVSNetPlWrapped
from robustmvd_tpu.models.wrappers.patchmatchnet import PatchmatchNetWrapped
from robustmvd_tpu.models.wrappers.vis_mvsnet import VisMvsnetWrapped
from robustmvd_tpu.models.wrappers.wrappers import (
    add_repo_to_path,
    get_wrapper_path,
)


def _mvd_inputs(rng, V=2, H=96, W=128, batched=False):
    """Synthetic un/batched MVD inputs in the sample-dict convention:

    view-lists of CHW uint8-range images, 4x4 poses, 3x3 intrinsics."""
    images = [rng.rand(3, H, W).astype(np.float32) * 255 for _ in range(V)]
    poses = [np.eye(4, dtype=np.float32) for _ in range(V)]
    for i, p in enumerate(poses[1:]):
        p[0, 3] = 0.1 * (i + 1)
    K = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32)
    intrinsics = [K.copy() for _ in range(V)]
    keyview_idx = 0
    if batched:
        images = [i[None] for i in images]
        poses = [p[None] for p in poses]
        intrinsics = [k[None] for k in intrinsics]
        keyview_idx = np.array([0])
    return images, keyview_idx, poses, intrinsics


# ---------------------------------------------------------------------------
# paths.toml resolution


def test_wrapper_paths_resolution():
    # every wrapped repo has a configured root
    for name in ("monodepth2", "mvsnet_pl", "vis_mvsnet", "midas",
                 "cvp_mvsnet", "patchmatchnet"):
        assert get_wrapper_path(name, "root") is not None
    assert get_wrapper_path("nonexistent_repo", "root") is None
    # missing repo directory -> actionable error naming the setup script
    with pytest.raises(FileNotFoundError, match="setup script"):
        add_repo_to_path("nonexistent_repo")


# ---------------------------------------------------------------------------
# monodepth2


def _make_monodepth2(stereo):
    w = object.__new__(Monodepth2Wrapped)
    w.torch = torch
    w.encoder = lambda x: x
    w.decoder = lambda feats: {("disp", 0): torch.sigmoid(feats.mean(1, keepdim=True))}
    w.height, w.width = 64, 128
    w.trained_on_stereo = stereo
    return w


def test_monodepth2_wrapper_run(rng):
    images, kv, poses, intr = _mvd_inputs(rng)
    wrapped = _make_monodepth2(stereo=True)
    pred, aux = wrapped.run(images=images, keyview_idx=kv, poses=poses, intrinsics=intr)
    # resized to the checkpoint's fixed input size, un-batched on return
    assert pred["depth"].shape == (1, 64, 128)
    assert np.isfinite(pred["depth"]).all() and (pred["depth"] > 0).all()
    assert aux == {}

    # the stereo-trained scaling: disp is divided by 5.4, so depth is 5.4x
    mono = _make_monodepth2(stereo=False)
    pred_mono, _ = mono.run(images=images, keyview_idx=kv, poses=poses, intrinsics=intr)
    np.testing.assert_allclose(
        pred["depth"], pred_mono["depth"] * 5.4, rtol=1e-5
    )


# ---------------------------------------------------------------------------
# MiDaS


def _midas_normalize(mean, std):
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    def apply(x):
        x["image"] = (x["image"] - mean) / std
        return x

    return apply


def test_midas_wrapper_run(rng):
    w = object.__new__(MidasWrapped)
    w.torch = torch
    w._resize = lambda x: x  # fixtures are already multiple-of-32
    w._normalize = _midas_normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])
    w._prepare = lambda x: {
        "image": np.ascontiguousarray(np.transpose(x["image"], (2, 0, 1)))
    }
    w.model = lambda t: torch.full_like(t[:, 0], 2.0)  # invdepth == 2

    images, kv, poses, intr = _mvd_inputs(rng, H=96, W=128)
    pred, aux = w.run(images=images, keyview_idx=kv, poses=poses, intrinsics=intr)
    # output_adapter inverts the inverse depth
    assert pred["depth"].shape == (1, 96, 128)
    np.testing.assert_allclose(pred["depth"], 0.5)


# ---------------------------------------------------------------------------
# Vis-MVSNet


def test_vis_mvsnet_wrapper_cam_packing_and_run(rng):
    w = object.__new__(VisMvsnetWrapped)
    w.torch = torch
    w.num_sampling_steps = 16

    images, kv, poses, intr = _mvd_inputs(rng, V=3, H=96, W=160, batched=True)

    adapted = w.input_adapter(
        images=images, keyview_idx=kv, poses=poses, intrinsics=intr,
        depth_range=[0.5, 8.5],
    )
    # 96x160 -> padded-to-64-multiple 128x192, RGB->BGR, imagenet-normalized
    assert adapted["images"][0].shape == (1, 3, 128, 192)
    cam = adapted["cams"][1]
    assert cam.shape == (1, 2, 4, 4)
    # extrinsic slot 0 holds the pose; intrinsic slot 1 rows: K + depth row
    np.testing.assert_allclose(cam[0, 0], poses[1][0])
    sx = 192 / 160.0
    np.testing.assert_allclose(cam[0, 1, 0, 0], intr[1][0, 0, 0] * sx, rtol=1e-5)
    assert cam[0, 1, 3, 0] == pytest.approx(0.5)  # min depth
    assert cam[0, 1, 3, 1] == pytest.approx(8.0 / 16)  # step size
    assert cam[0, 1, 3, 2] == 16  # num steps
    assert cam[0, 1, 3, 3] == pytest.approx(8.5)  # max depth

    def fake_model(inp, sizes, scales, mode):
        assert mode == "soft"
        assert inp["srcs"].shape[1] == 2  # two source views stacked on dim 1
        B, _, H, W = inp["ref"].shape
        refined = inp["ref"].mean(1, keepdim=True).abs() + 0.1
        probs = [None, None, torch.full((B, 1, H, W), 0.75)]
        return {}, refined, probs

    w.model = fake_model
    pred, aux = w(**adapted)
    assert pred["depth"].shape == (1, 1, 128, 192)
    np.testing.assert_allclose(pred["depth_uncertainty"], 0.25)
    pred, aux = w.output_adapter((pred, aux))
    assert isinstance(pred["depth"], np.ndarray)


# ---------------------------------------------------------------------------
# mvsnet_pl


def test_mvsnet_pl_wrapper_proj_mats_and_run(rng):
    w = object.__new__(MVSNetPlWrapped)
    w.torch = torch
    w.sample_in_inv_depth_space = False
    w.num_sampling_steps = 8

    images, kv, poses, intr = _mvd_inputs(rng, V=2, H=128, W=192, batched=True)
    adapted = w.input_adapter(
        images=images, keyview_idx=kv, poses=poses, intrinsics=intr,
        depth_range=[1.0, 9.0],
    )
    # depth samples span the given range linearly
    ds = np.asarray(adapted["depth_samples"])
    assert ds.shape[-1] == 8
    assert ds.reshape(-1)[0] == pytest.approx(1.0)
    assert ds.reshape(-1)[-1] == pytest.approx(9.0)

    # the key view's proj mat is the INVERSE of (K/4 @ pose); source views
    # are forward projections — key @ source recovers the relative transform
    K4 = intr[0][0] * np.array([[0.25] * 3, [0.25] * 3, [1.0] * 3])
    proj0 = poses[0][0].copy()
    proj0[:3, :4] = K4 @ proj0[:3, :4]
    np.testing.assert_allclose(
        adapted["proj_mats"][0][0] @ proj0, np.eye(4), atol=1e-4
    )

    def fake_forward(imgs, projs, depth_samples):
        assert imgs.shape[1] == 2  # key + 1 source stacked on dim 1
        B, _, _, H, W = imgs.shape
        return imgs[:, 0].mean(1).abs() + 0.2, torch.full((B, H, W), 0.9)

    w.model = type("M", (), {"forward": staticmethod(fake_forward)})()
    pred, aux = w(**adapted)
    assert pred["depth"].shape == (1, 1, 128, 192)
    np.testing.assert_allclose(pred["depth_uncertainty"], 1 - 0.9, rtol=1e-6)


# ---------------------------------------------------------------------------
# PatchmatchNet


def test_patchmatchnet_wrapper_run(rng):
    w = object.__new__(PatchmatchNetWrapped)
    w.torch = torch
    w.num_sampling_steps = 8

    def fake_forward(imgs, intrinsics, extrinsics, min_d, max_d):
        # images arrive /255-normalized; defaults min=0.2 max=100
        assert float(imgs[0].max()) <= 1.0
        assert float(min_d) == pytest.approx(0.2)
        assert float(max_d) == pytest.approx(100.0)
        B, _, H, W = imgs[0].shape
        return imgs[0].mean(1, keepdim=True) + 0.3, torch.full((B, H, W), 0.6), None

    w.model = type("M", (), {"forward": staticmethod(fake_forward)})()

    images, kv, poses, intr = _mvd_inputs(rng, V=2, H=64, W=96)
    pred, aux = w.run(images=images, keyview_idx=kv, poses=poses, intrinsics=intr)
    assert pred["depth"].shape == (1, 64, 96)
    np.testing.assert_allclose(pred["depth_uncertainty"], 0.4, rtol=1e-6)


# ---------------------------------------------------------------------------
# CVP-MVSNet


def test_cvp_mvsnet_wrapper_run(rng):
    w = object.__new__(CVPMVSNetWrapped)
    w.torch = torch
    w.num_sampling_steps = 8
    w.args = type("A", (), {"nsrc": None, "nscale": 5, "mode": "test"})()

    def fake_model(ref_img, src_imgs, ref_in, src_in, ref_ex, src_ex,
                   depth_min, depth_max):
        assert src_imgs.shape[1] == 2  # CVP needs >= 2 source views
        B, _, H, W = ref_img.shape
        return {
            "depth_est_list": [ref_img.mean(1) + 0.4],
            "prob_confidence": torch.full((B, H, W), 0.8),
        }

    w.model = fake_model

    images, kv, poses, intr = _mvd_inputs(rng, V=3, H=64, W=128)
    pred, aux = w.run(images=images, keyview_idx=kv, poses=poses, intrinsics=intr)
    assert w.args.nsrc == 2  # set per-call from the actual source count
    assert pred["depth"].shape == (1, 64, 128)
    np.testing.assert_allclose(pred["depth_uncertainty"], 1 - 0.8, rtol=1e-6)


# ---------------------------------------------------------------------------
# a wrapped model driven by the real eval engine


@pytest.mark.slow
def test_wrapped_model_through_eval_engine(rng):
    """The eval engine drives wrapped models through the same duck-typed

    input_adapter/__call__/output_adapter protocol as native models
    (reference: eval_all.sh runs monodepth2 with --max_source_views 0
    --alignment median)."""
    from robustmvd_tpu import create_dataset, create_evaluation

    wrapped = _make_monodepth2(stereo=False)
    dataset = create_dataset(
        "synthetic.train.mvd", num_samples=2, num_views=2, height=64, width=96
    )
    evaluation = create_evaluation(
        "mvd",
        out_dir=None,
        inputs=["images"],
        alignment="median",
        max_source_views=0,
        eval_uncertainty=False,
        verbose=False,
    )
    results = evaluation(dataset=dataset, model=wrapped, burn_in_samples=0)
    assert len(results) == 2
    assert np.isfinite(results[(0, "absrel")]).all()
