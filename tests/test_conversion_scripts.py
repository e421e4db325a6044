"""Conversion scripts executed end-to-end on synthesized raw downloads.

Each test builds the RAW archive layout a download produces, runs the
conversion script's functions, and asserts the converted tree is exactly
what the dataset loaders consume — the convert_dtu / convert_dtu_mvsnet /
convert_staticthings3d / convert_flyingthings3d counterparts of the
convert_scannet .sens test (reference: rmvd/data/scripts/). The DTU- and
BlendedMVS-MVSNet cases continue through the *mvsnet-split* training
dataset generation (DTUMvsnetTrain pair.txt scan, BlendedMVSMVSNetTrain;
reference: rmvd/data/dtu.py:481-502, blendedmvs.py:449-468).
"""

import importlib
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(__file__))
from test_dataset_fixtures import _write_cam_txt, _write_jpg, _write_pfm, _write_png


def _script(name):
    return importlib.import_module(f"robustmvd_tpu.data.scripts.{name}")


# ---------------------------------------------------------------- DTU


def _make_raw_dtu(tmp_path, rng, scan="scan2", n_views=3, lights=(0, 1, 3)):
    """Raw DTU download layout: Rectified/<scan>/rect_NNN_L_r5000.png
    (views numbered from 1), dtu/Depths_raw/<scan>/depth_map_NNNN.pfm (+
    mask PNGs), Points/stl/stlNNN_total.ply, dtu/Cameras_1."""
    raw = tmp_path / "raw"
    H, W = 24, 32
    rect = raw / "Rectified" / scan
    for v in range(1, n_views + 1):
        for l in lights:
            _write_png(
                str(rect / f"rect_{v:03d}_{l}_r5000.png"),
                (rng.rand(H, W, 3) * 255).astype(np.uint8),
            )
    depths = raw / "dtu" / "Depths_raw" / scan
    for v in range(n_views):
        _write_pfm(
            str(depths / f"depth_map_{v:04d}.pfm"),
            (rng.rand(H, W) * 500 + 400).astype(np.float32),
        )
        _write_png(
            str(depths / f"depth_visual_{v:04d}.png"),
            ((rng.rand(H, W) > 0.5) * 255).astype(np.uint8),
        )
    pts = raw / "Points" / "stl"
    os.makedirs(pts, exist_ok=True)
    (pts / f"stl{int(scan[4:]):03d}_total.ply").write_bytes(b"ply\nend_header\n")

    cams = raw / "dtu" / "Cameras_1"
    from tests_common import random_pose_np

    for v in range(n_views):
        _write_cam_txt(
            str(cams / f"{v:08d}_cam.txt"),
            random_pose_np(rng),
            np.array([[100, 0, W / 2], [0, 100, H / 2], [0, 0, 1]], np.float32),
        )
    with open(cams / "pair.txt", "w") as f:
        f.write(f"{n_views}\n")
        for k in range(n_views):
            srcs = [s for s in range(n_views) if s != k]
            f.write(f"{k}\n{len(srcs)} ")
            f.write(" ".join(f"{s} {10.0 - s}" for s in srcs) + "\n")
    return raw, (H, W)


def test_convert_dtu_end_to_end(tmp_path, rng):
    mod = _script("convert_dtu")
    raw, _ = _make_raw_dtu(tmp_path, rng)
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    mod.copy_rectified_images(str(raw), out)
    mod.copy_gt_depths(str(raw), out)
    mod.copy_points(str(raw), out)

    # benchmark layout: light-condition-3 images renumbered from 0
    imgs = sorted(os.listdir(osp.join(out, "scan2", "images")))
    assert imgs == [f"{i:08d}.png" for i in range(3)]
    with open(osp.join(out, "scan2", "images", "00000000.png"), "rb") as f:
        converted = f.read()
    with open(osp.join(raw, "Rectified", "scan2", "rect_001_3_r5000.png"), "rb") as f:
        assert converted == f.read()
    depths = sorted(os.listdir(osp.join(out, "scan2", "gt_depths")))
    assert depths == [f"{i:08d}.pfm" for i in range(3)]
    assert osp.isfile(osp.join(out, "scan2", "scan.ply"))


def test_convert_dtu_mvsnet_and_train_generation(tmp_path, rng, monkeypatch):
    """convert_dtu_mvsnet output drives DTUMvsnetTrain end-to-end: scene
    scan -> pair.txt first-2-source samples x 7 light conditions ->
    Sample.load with masks. The bundled 27097-sample manifest is bypassed
    (redirected to tmp) so the *generation* path actually runs."""
    import robustmvd_tpu.data.dtu as dtu_mod
    from robustmvd_tpu.data import create_dataset

    mod = _script("convert_dtu_mvsnet")
    raw, (H, W) = _make_raw_dtu(tmp_path, rng, lights=tuple(range(7)))
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    mod.copy_rectified_images(str(raw), out)
    mod._copy_numbered(str(raw), out, "Depths_raw", ".pfm", "gt_depths")
    mod._copy_numbered(str(raw), out, "Depths_raw", ".png", "masks")
    mod.copy_camera_params(str(raw), out)

    # view numbering shifted to 0-based, all light conditions kept
    assert osp.isfile(osp.join(out, "scan2", "images", "rect_000_0_r5000.png"))
    assert osp.isfile(osp.join(out, "scan2", "images", "rect_002_6_r5000.png"))
    assert osp.isfile(osp.join(out, "scan2", "masks", "00000000.png"))
    assert osp.isfile(osp.join(out, "scan2", "cameras", "pair.txt"))
    assert osp.isfile(osp.join(out, "scan2", "cameras", "00000001_cam.txt"))

    monkeypatch.setattr(
        dtu_mod,
        "_sample_list_path",
        lambda name: str(tmp_path / f"{name}.pickle"),
    )
    ds = create_dataset("dtu.train_mvsnet.mvd", root=out, verbose=False)
    # 3 keys x 1 (first-2-sources combo) x 7 light conditions
    assert len(ds) == 21, len(ds)
    sample = ds[0]
    assert len(sample["images"]) == 3
    assert sample["images"][0].shape == (3, H, W)
    assert sample["depth"].shape == (1, H, W)
    assert np.asarray(sample["masks"]).shape == (1, H, W)
    assert "invdepth" in sample and sample["depth_range"][0] > 0


# ------------------------------------------------------- StaticThings3D


def test_convert_staticthings3d_end_to_end(tmp_path, rng):
    mod = _script("convert_staticthings3d")
    raw = tmp_path / "raw"
    for dtype, ext, cams in [
        ("frames_cleanpass", "png", True),
        ("depths", "float3", True),
        ("intrinsics", "float3", False),
    ]:
        for cam in ["left", "right"] if cams else [None]:
            d = raw / dtype / "TRAIN" / "A" / "0000"
            d = d / cam if cam else d
            os.makedirs(d, exist_ok=True)
            for frame in (6, 7):
                (d / f"{frame:04d}.{ext}").write_bytes(b"x" * 16)

    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    mod.link_tree(str(raw), out, "frames_cleanpass", "png")
    mod.link_tree(str(raw), out, "depths", "float3")
    mod.link_tree(str(raw), out, "intrinsics", "float3", cams_from_dir=False)

    link = osp.join(out, "TRAIN", "A", "0000", "frames_cleanpass", "left", "0006.png")
    assert osp.islink(link) and osp.isfile(link)
    assert osp.isfile(
        osp.join(out, "TRAIN", "A", "0000", "depths", "right", "0007.float3")
    )
    # intrinsics are shared across cams (cams_from_dir=False)
    assert osp.isfile(
        osp.join(out, "TRAIN", "A", "0000", "intrinsics", "left", "0006.float3")
    )
    assert osp.isfile(
        osp.join(out, "TRAIN", "A", "0000", "intrinsics", "right", "0006.float3")
    )


# ------------------------------------------------------ FlyingThings3D


def test_convert_flyingthings3d_end_to_end(tmp_path, rng):
    mod = _script("convert_flyingthings3d")
    raw = tmp_path / "raw"

    for cam in ("left", "right"):
        d = raw / "frames_cleanpass" / "TRAIN" / "A" / "0000" / cam
        os.makedirs(d, exist_ok=True)
        for frame in (6, 7):
            (d / f"{frame:04d}.png").write_bytes(b"x" * 16)
        d = raw / "disparity" / "TRAIN" / "A" / "0000" / cam
        for frame in (6, 7):
            _write_pfm(str(d / f"{frame:04d}.pfm"), rng.rand(8, 12).astype(np.float32))

    cam_dir = raw / "camera_data" / "TRAIN" / "A" / "0000"
    os.makedirs(cam_dir, exist_ok=True)
    lines = []
    for i, frame in enumerate((6, 7)):
        pose = np.eye(4)
        pose[0, 3] = 0.3 * i
        lines.append(f"Frame {frame}")
        lines.append("L " + " ".join(str(v) for v in pose.reshape(-1)))
        lines.append("R " + " ".join(str(v) for v in pose.reshape(-1)))
        lines.append("")
    (cam_dir / "camera_data.txt").write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    mod.link_tree(str(raw), out, "frames_cleanpass", "png")
    mod.copy_disparities(str(raw), out)
    mod.copy_calibrations(str(raw), out)

    seq = osp.join(out, "TRAIN", "A", "0000")
    assert osp.isfile(osp.join(seq, "frames_cleanpass", "left", "0006.png"))
    assert osp.isfile(osp.join(seq, "disparities", "right", "0007.pfm"))
    # first frame is the rig reference: left pose = L_to_center exactly
    pose0 = np.load(osp.join(seq, "poses", "left", "0006.npy"))
    expect = np.identity(4)
    expect[0, 3] = 0.5
    np.testing.assert_allclose(pose0, expect, atol=1e-12)
    K = np.load(osp.join(seq, "intrinsics", "left", "0007.npy"))
    np.testing.assert_allclose(
        K, [[1050.0, 0, 480.0], [0, 1050.0, 270.0], [0, 0, 1.0]]
    )


# ------------------------------------------------- BlendedMVS (mvsnet split)


def test_blendedmvs_mvsnet_train_generation(tmp_path, rng):
    """BlendedMVSMVSNetTrain: pair.txt scan with first-2-source samples
    (all_combinations=False; reference: blendedmvs.py:449-468)."""
    from tests_common import random_pose_np

    from robustmvd_tpu.data import create_dataset
    from robustmvd_tpu.data.blendedmvs import BMVS_TRAIN_SCENES
    from robustmvd_tpu.data.dataset import _sample_list_path

    scene = BMVS_TRAIN_SCENES[0]
    base = tmp_path / scene
    H, W = 16, 24
    for v in range(4):
        _write_jpg(
            str(base / "blended_images" / f"{v:08d}_masked.jpg"),
            (rng.rand(H, W, 3) * 255).astype(np.uint8),
        )
        _write_cam_txt(
            str(base / "cams" / f"{v:08d}_cam.txt"),
            random_pose_np(rng),
            np.array([[20, 0, W / 2], [0, 20, H / 2], [0, 0, 1]], np.float32),
            depth_line="0.8 0.01 128 2.08",
        )
        _write_pfm(
            str(base / "rendered_depth_maps" / f"{v:08d}.pfm"),
            (rng.rand(H, W) * 2 + 0.8).astype(np.float32),
        )
    with open(base / "cams" / "pair.txt", "w") as f:
        f.write("2\n")
        f.write("0\n3 1 9.0 2 8.0 3 7.0\n")
        f.write("1\n3 0 9.0 2 8.0 3 7.0\n")

    cache = _sample_list_path("blendedmvs.train_mvsnet.mvd")
    assert not osp.exists(cache), "stale cached BlendedMVS mvsnet sample list"
    try:
        ds = create_dataset(
            "blendedmvs.train_mvsnet.mvd", root=str(tmp_path), verbose=False
        )
        # 2 keys x 1 first-2-source combo (no combinations)
        assert len(ds) == 2, len(ds)
        out = ds[0]
        assert len(out["images"]) == 3
        assert out["images"][0].shape == (3, H, W)
        assert out["depth"].shape == (1, H, W)
        assert "invdepth" in out and out["depth_range"][0] > 0
    finally:
        if osp.exists(cache):
            os.remove(cache)
