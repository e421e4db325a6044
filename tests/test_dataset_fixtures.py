"""Raw-format fixture tests for every benchmark/training dataset loader.

Each test takes the FIRST SAMPLE OF THE REAL BUNDLED SAMPLE LIST (the
manifest the benchmark actually evaluates), synthesizes the on-disk files
it references in the dataset's raw format, and drives `Sample.load` —
proving the format readers (PFM, .float3, raw-float depth, 16-bit PNG,
npz, cam-txt) and path conventions against the reference's documented
layouts:
- DTU: rmvd/data/dtu.py:255-502 (PFM /1000, masks, light conditions)
- ScanNet: rmvd/data/scannet.py:15-66 (LANCZOS 640x480, depth/1000)
- ETH3D: rmvd/data/eth3d.py:25-58 (raw float32 4032x6048 depth)
- T&T: rmvd/data/tanks_and_temples.py:18-55 (npz depths)
- StaticThings3D: rmvd/data/staticthings3d.py:18-35 (.float3)
- BlendedMVS: rmvd/data/blendedmvs.py:190-253 (masked jpgs, cam txt, PFM)
plus the convert_scannet .sens parser end-to-end.
"""

import copy
import os
import os.path as osp
import struct
import zlib

import numpy as np
import pytest

from robustmvd_tpu.data.dataset import (
    _preprocess_sample,
    _sample_list_path,
    load_sample_list,
)
from robustmvd_tpu.utils import numpy_collate


# ---------------------------------------------------------------- writers


def _write_png(path, arr):
    from PIL import Image

    os.makedirs(osp.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _write_jpg(path, arr):
    from PIL import Image

    os.makedirs(osp.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path, quality=95)


def _write_pfm(path, arr):
    """Little-endian grayscale PFM, bottom-up row order (the inverse of

    robustmvd_tpu.data.dtu.read_pfm)."""
    os.makedirs(osp.dirname(path), exist_ok=True)
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{w} {h}\n".encode("ascii"))
        f.write(b"-1.0\n")
        f.write(np.flipud(arr).astype("<f4").tobytes())


def _write_float3(path, arr):
    """lmb-freiburg float3: 'float' keyword, ndim, dims (minor-to-major),

    then raw float32 (read back reversed — staticthings3d.py readFloat)."""
    os.makedirs(osp.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"float\n")
        f.write(f"{arr.ndim}\n".encode("ascii"))
        for d in reversed(arr.shape):
            f.write(f"{d}\n".encode("ascii"))
        f.write(arr.astype(np.float32).tobytes())


def _write_cam_txt(path, pose, K, depth_line="425.0 2.5 192 935.0"):
    """MVSNet-convention cam file: extrinsic 4x4 (lines 1-4), intrinsic 3x3

    (lines 7-9), depth min/interval/steps/max on line 11."""
    os.makedirs(osp.dirname(path), exist_ok=True)
    lines = ["extrinsic"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in pose]
    lines += ["", "intrinsic"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in K]
    lines += ["", depth_line, ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def _first_sample(list_name, num_views):
    sample = copy.deepcopy(load_sample_list(_sample_list_path(list_name))[0])
    for key in ("images", "poses", "intrinsics"):
        sample.data[key] = sample.data[key][:num_views]
    if sample.data.get("keyview_idx", 0) >= num_views:
        sample.data["keyview_idx"] = 0
    return sample


def _check_loaded(out, num_views, img_shape, depth_shape):
    assert len(out["images"]) == num_views
    for img in out["images"]:
        assert img.shape == img_shape and img.dtype == np.float32
    assert out["depth"].shape == depth_shape
    assert np.isfinite(out["depth"]).all()
    _preprocess_sample(out)
    kv = out["keyview_idx"]
    np.testing.assert_allclose(out["poses"][kv], np.eye(4), atol=1e-5)
    assert "invdepth" in out and "depth_range" in out
    batch = numpy_collate([out])
    assert batch["images"][0].shape == (1,) + img_shape


# ---------------------------------------------------------------- DTU


def test_dtu_benchmark_sample_and_dataset(tmp_path, rng):
    """Real dtu.robustmvd manifest entry loaded from a synthesized scan

    tree, end-to-end through create_dataset (PFM depths / 1000)."""
    from robustmvd_tpu.data import create_dataset

    samples = load_sample_list(_sample_list_path("dtu.robustmvd.mvd"))
    sample0 = samples[0]
    base = str(tmp_path / sample0.base)

    H, W = 32, 40
    for img_item in sample0.data["images"]:
        arr = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        _write_png(osp.join(base, img_item.path), arr)
    depth_mm = (rng.rand(H, W) * 500 + 400).astype(np.float32)
    depth_mm[:3] = np.nan  # invalid band -> 0 after nan_to_num
    _write_pfm(osp.join(base, sample0.data["depth"].path), depth_mm)

    ds = create_dataset("dtu.robustmvd.mvd", root=str(tmp_path), verbose=False)
    assert len(ds) == 110  # the full manifest is present
    out = ds[0]
    assert len(out["images"]) == len(sample0.data["images"])
    assert out["images"][0].shape == (3, H, W)
    # PFM values scaled to meters, NaNs zeroed
    np.testing.assert_allclose(
        out["depth"][0, 3:], depth_mm[3:] / 1000.0, rtol=1e-6
    )
    assert (out["depth"][0, :3] == 0).all()
    assert "invdepth" in out and out["depth_range"][0] > 0


def test_dtu_light_condition_scene_paths(tmp_path, rng):
    """The DTUMvsnetTrain-style dispatch path: (view_id, light_idx) image

    tuples, cam-txt pose/intrinsics, mask PNGs, pair.txt padding
    (reference: dtu.py:255-347)."""
    from tests_common import random_pose_np

    from robustmvd_tpu.data.dtu import (
        DTUMaxDepth,
        DTUMinDepth,
        DTUPair,
        DTUSample,
    )

    base = str(tmp_path / "scan1")
    H, W = 24, 32
    view_ids, light = [0, 1], 3
    for v in view_ids:
        arr = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        _write_png(osp.join(base, f"images/rect_{v:03d}_{light}_r5000.png"), arr)
        _write_cam_txt(
            osp.join(base, f"cameras/{v:08d}_cam.txt"),
            random_pose_np(rng),
            np.array([[100, 0, W / 2], [0, 100, H / 2], [0, 0, 1]], np.float32),
        )
        _write_png(
            osp.join(base, f"masks/{v:08d}.png"),
            (rng.rand(H, W) > 0.5).astype(np.uint8) * 255,
        )
    depth_mm = (rng.rand(H, W) * 500 + 400).astype(np.float32)
    _write_pfm(osp.join(base, "gt_depths/00000000.pfm"), depth_mm)

    # pair.txt with 2 entries, 1 source each -> padded to 10 by repetition
    with open(osp.join(base, "pair.txt"), "w") as f:
        f.write("2\n0\n1 1 12.5\n1\n1 0 11.0\n")
    pair = DTUPair(osp.join(base, "pair.txt"))
    assert pair.get_source_ids(0) == [1] * 10
    assert pair.get_source_scores(1) == [11.0] * 10

    sample = DTUSample(name="scan1/0", base="scan1")
    sample.data = {
        "images": [(v, light) for v in view_ids],
        "poses": [random_pose_np(rng) for _ in view_ids],
        "intrinsics": [np.eye(3, dtype=np.float32) * 100 for _ in view_ids],
        "depth": 0,
        "masks": [0],
        "keyview_idx": 0,
    }
    out = sample.load(str(tmp_path))
    _check_loaded(out, 2, (3, H, W), (1, H, W))
    assert out["masks"][0].shape == (1, H, W)
    assert set(np.unique(out["masks"][0])) <= {0.0, 255.0}

    assert DTUMinDepth("cameras/00000000_cam.txt").load(base) == 425.0
    assert DTUMaxDepth("cameras/00000000_cam.txt").load(base) == 935.0


# ---------------------------------------------------------------- ETH3D


def test_eth3d_benchmark_sample_fixture(tmp_path, rng):
    """Real eth3d.robustmvd manifest entry: DSLR jpgs + raw-float32

    4032x6048 depth with NaN/inf scrubbing (reference: eth3d.py:25-58)."""
    sample = _first_sample("eth3d.robustmvd.mvd", num_views=2)
    base = str(tmp_path / sample.base)

    H, W = 24, 36  # image size is not constrained by the loader
    for img_item in sample.data["images"]:
        _write_jpg(
            osp.join(base, img_item.path),
            (rng.rand(H, W, 3) * 255).astype(np.uint8),
        )
    depth = np.zeros((4032, 6048), np.float32)  # the loader's fixed size
    depth[:8, :8] = 3.25
    depth[8, :4] = np.nan
    depth[9, :4] = np.inf
    depth_path = osp.join(base, sample.data["depth"].path)
    os.makedirs(osp.dirname(depth_path), exist_ok=True)
    depth.tofile(depth_path)

    out = sample.load(str(tmp_path))
    assert out["images"][0].shape == (3, H, W)
    assert out["depth"].shape == (1, 4032, 6048)
    np.testing.assert_allclose(out["depth"][0, :8, :8], 3.25)
    assert (out["depth"][0, 8:10, :4] == 0).all()  # nan/inf -> invalid


# ---------------------------------------------------------------- ScanNet


def test_scannet_benchmark_sample_fixture(tmp_path, rng):
    """Real scannet.robustmvd manifest entry: color jpgs resized to

    640x480, 16-bit depth PNG / 1000 (reference: scannet.py:15-66)."""
    sample = _first_sample("scannet.robustmvd.mvd", num_views=2)
    base = str(tmp_path / sample.base)

    for img_item in sample.data["images"]:
        assert (img_item.height, img_item.width) == (480, 640)
        _write_jpg(
            osp.join(base, img_item.path),
            (rng.rand(120, 160, 3) * 255).astype(np.uint8),
        )
    depth16 = (rng.rand(120, 160) * 4000 + 500).astype(np.uint16)
    depth16[:5] = 0
    _write_png(osp.join(base, sample.data["depth"].path), depth16)

    out = sample.load(str(tmp_path))
    _check_loaded(out, 2, (3, 480, 640), (1, 120, 160))
    np.testing.assert_allclose(out["depth"][0, 5:], depth16[5:] / 1000.0, rtol=1e-6)
    assert (out["depth"][0, :5] == 0).all()


# ------------------------------------------------------- Tanks and Temples


def test_tanks_and_temples_benchmark_sample_fixture(tmp_path, rng):
    """Real tanks_and_temples.robustmvd manifest entry: jpgs + npz depths

    (reference: tanks_and_temples.py:18-55)."""
    sample = _first_sample("tanks_and_temples.robustmvd.mvd", num_views=2)
    base = str(tmp_path / sample.base)

    H, W = 28, 44
    for img_item in sample.data["images"]:
        _write_jpg(
            osp.join(base, img_item.path),
            (rng.rand(H, W, 3) * 255).astype(np.uint8),
        )
    depth = (rng.rand(H, W) * 5 + 1).astype(np.float32)
    depth[0, :] = np.nan
    depth_path = osp.join(base, sample.data["depth"].path)
    os.makedirs(osp.dirname(depth_path), exist_ok=True)
    np.savez(depth_path if depth_path.endswith(".npz") else depth_path + ".npz", depth)
    if not depth_path.endswith(".npz"):
        os.rename(depth_path + ".npz", depth_path)

    out = sample.load(str(tmp_path))
    _check_loaded(out, 2, (3, H, W), (1, H, W))
    np.testing.assert_allclose(out["depth"][0, 1:], depth[1:], rtol=1e-6)
    assert (out["depth"][0, 0] == 0).all()


# ---------------------------------------------------------- StaticThings3D


def test_staticthings3d_float3_sample_fixture(tmp_path, rng):
    """.float3 depth/intrinsics/pose readers + the (cam, frame) dispatch

    (reference: staticthings3d.py:18-35,139-315)."""
    from tests_common import random_pose_np

    from robustmvd_tpu.data.staticthings3d import StaticThings3DSample, read_float3

    base_rel = "TRAIN/A/0000"
    base = str(tmp_path / base_rel)
    H, W = 20, 30
    frames = [6, 7]
    poses = {}
    for fn in frames:
        _write_png(
            osp.join(base, f"frames_cleanpass/left/{fn:04d}.png"),
            (rng.rand(H, W, 3) * 255).astype(np.uint8),
        )
        depth = (rng.rand(H, W) * 30 + 1).astype(np.float32)
        if fn == frames[0]:
            depth[0, 0] = -1.0  # negative -> invalid
            depth[0, 1] = np.inf
        _write_float3(osp.join(base, f"depths/left/{fn:04d}.float3"), depth)
        K = np.array([[100, 0, W / 2], [0, 100, H / 2], [0, 0, 1]], np.float32)
        _write_float3(osp.join(base, f"intrinsics/left/{fn:04d}.float3"), K)
        poses[fn] = random_pose_np(rng)
        _write_float3(osp.join(base, f"poses/left/{fn:04d}.float3"), poses[fn])

    # round-trip of the reader itself
    rt = read_float3(osp.join(base, f"intrinsics/left/{frames[0]:04d}.float3"))
    np.testing.assert_allclose(rt, K)

    sample = StaticThings3DSample(base=base_rel, name="A/0000/left/0006")
    sample.data = {
        "images": [("l", f) for f in frames],
        "poses": [("l", f) for f in frames],
        "intrinsics": [("l", f) for f in frames],
        "depth": ("l", frames[0]),
        "keyview_idx": 0,
    }
    out = sample.load(str(tmp_path))
    assert out["images"][0].shape == (3, H, W)
    assert out["depth"].shape == (1, H, W)
    assert out["depth"][0, 0, 0] == 0 and out["depth"][0, 0, 1] == 0
    np.testing.assert_allclose(out["poses"][1], poses[frames[1]], rtol=1e-6)
    _preprocess_sample(out)
    assert "invdepth" in out


# -------------------------------------------------------------- BlendedMVS


def test_blendedmvs_sample_fixture(tmp_path, rng):
    """Masked jpgs + MVSNet cam txt + rendered-depth PFMs + pair.txt

    (reference: blendedmvs.py:190-253)."""
    from tests_common import random_pose_np

    from robustmvd_tpu.data.blendedmvs import (
        BlendedMVSMaxDepth,
        BlendedMVSMinDepth,
        BlendedMVSPair,
        BlendedMVSSample,
    )

    scene = "5a0271884e62597cdee0d0eb"
    base = str(tmp_path / scene)
    H, W = 24, 32
    view_ids = [0, 1]
    for v in view_ids:
        _write_jpg(
            osp.join(base, f"blended_images/{v:08d}_masked.jpg"),
            (rng.rand(H, W, 3) * 255).astype(np.uint8),
        )
        _write_cam_txt(
            osp.join(base, f"cams/{v:08d}_cam.txt"),
            random_pose_np(rng),
            np.array([[90, 0, W / 2], [0, 90, H / 2], [0, 0, 1]], np.float32),
            depth_line="0.8 0.01 128 2.08",
        )
        depth = (rng.rand(H, W) * 2 + 0.8).astype(np.float32)
        _write_pfm(osp.join(base, f"rendered_depth_maps/{v:08d}.pfm"), depth)

    with open(osp.join(base, "cams", "pair.txt"), "w") as f:
        f.write("2\n0\n1 1 120.5\n1\n1 0 88.0\n")
    pair = BlendedMVSPair(osp.join(base, "cams", "pair.txt"))
    assert pair.get_source_ids(0) == [1] * 10

    sample = BlendedMVSSample(base=scene, name=f"{scene}/0")
    sample.data = {
        "images": view_ids,
        "poses": view_ids,
        "intrinsics": view_ids,
        "depth": 0,
        "keyview_idx": 0,
    }
    out = sample.load(str(tmp_path))
    _check_loaded(out, 2, (3, H, W), (1, H, W))
    # cam txt round trip: intrinsics center
    assert out["intrinsics"][0][0, 2] == W / 2

    assert BlendedMVSMinDepth("cams/00000000_cam.txt").load(base) == np.float32(0.8)
    assert BlendedMVSMaxDepth("cams/00000000_cam.txt").load(base) == np.float32(2.08)


# ------------------------------------------------- convert_scannet (.sens)


def _synthesize_sens(path, frames, rng):
    """Minimal valid .sens v4 recording (jpeg color + zlib_ushort depth)."""
    from io import BytesIO

    from PIL import Image

    Hc, Wc, Hd, Wd = 48, 64, 24, 32
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))
        name = b"synthetic_sensor"
        f.write(struct.pack("Q", len(name)))
        f.write(name)
        for _ in range(4):  # 4 camera matrices
            f.write(np.eye(4, dtype=np.float32).tobytes())
        f.write(struct.pack("i", 2))  # jpeg color
        f.write(struct.pack("i", 1))  # zlib_ushort depth
        f.write(struct.pack("II", Wc, Hc))
        f.write(struct.pack("II", Wd, Hd))
        f.write(struct.pack("f", 1000.0))
        f.write(struct.pack("Q", frames))

        depths = []
        for i in range(frames):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = 0.1 * i
            f.write(pose.tobytes())
            f.write(struct.pack("QQ", i, i))  # timestamps
            buf = BytesIO()
            Image.fromarray((rng.rand(Hc, Wc, 3) * 255).astype(np.uint8)).save(
                buf, format="JPEG"
            )
            color = buf.getvalue()
            depth_arr = (rng.rand(Hd, Wd) * 3000 + 400).astype(np.uint16)
            depths.append(depth_arr)
            depth = zlib.compress(depth_arr.tobytes())
            f.write(struct.pack("QQ", len(color), len(depth)))
            f.write(color)
            f.write(depth)
    return depths, (Hc, Wc, Hd, Wd)


def test_convert_scannet_sens_end_to_end(tmp_path, rng):
    """.sens recording -> convert_scannet export -> ScanNet loaders."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_scannet",
        osp.join(
            osp.dirname(__file__), "..", "robustmvd_tpu", "data", "scripts",
            "convert_scannet.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    sens_path = str(tmp_path / "scene0000_00.sens")
    depths, (Hc, Wc, Hd, Wd) = _synthesize_sens(sens_path, frames=2, rng=rng)

    out_dir = str(tmp_path / "exported" / "scene0000_00")
    os.makedirs(out_dir, exist_ok=True)
    mod.SensFile(sens_path).export(out_dir)

    # exported files exist and round-trip the depth exactly
    from PIL import Image

    for i in range(2):
        assert osp.exists(osp.join(out_dir, "color", f"{i}.jpg"))
        dep = np.array(Image.open(osp.join(out_dir, "depth", f"{i}.png")))
        np.testing.assert_array_equal(dep, depths[i])
        pose = np.loadtxt(osp.join(out_dir, "pose", f"{i}.txt"), dtype=np.float32)
        assert pose.shape == (4, 4) and pose[0, 3] == pytest.approx(0.1 * i)

    # feed the exported tree into the ScanNet Sample loaders
    from robustmvd_tpu.data.scannet import ScanNetDepth, ScanNetImage

    img = ScanNetImage("color/0.jpg", height=480, width=640).load(out_dir)
    assert img.shape == (3, 480, 640)
    dep = ScanNetDepth("depth/1.png").load(out_dir)
    np.testing.assert_allclose(dep[0], depths[1] / 1000.0, rtol=1e-6)


# --------------------------------------- StaticThings3D full dataset class


def test_staticthings3d_dataset_generation(tmp_path, rng):
    """Drive the full training-dataset machinery: directory scan ->

    seqconf sample generation (C(12,4) offset combinations, keyframes
    6..15, hard-sample filtering) -> Sample.load -> preprocessing
    (reference: staticthings3d.py:139-315)."""
    from tests_common import random_pose_np

    from robustmvd_tpu.data import create_dataset
    from robustmvd_tpu.data.dataset import _sample_list_path

    seq = tmp_path / "TRAIN" / "A" / "0000"
    H, W = 16, 24
    K = np.array([[20, 0, W / 2], [0, 20, H / 2], [0, 0, 1]], np.float32)
    for fn in range(0, 9):
        _write_png(
            str(seq / "frames_cleanpass" / "left" / f"{fn:04d}.png"),
            (rng.rand(H, W, 3) * 255).astype(np.uint8),
        )
        _write_float3(
            str(seq / "depths" / "left" / f"{fn:04d}.float3"),
            (rng.rand(H, W) * 30 + 1).astype(np.float32),
        )
        _write_float3(str(seq / "intrinsics" / "left" / f"{fn:04d}.float3"), K)
        _write_float3(
            str(seq / "poses" / "left" / f"{fn:04d}.float3"), random_pose_np(rng)
        )

    # the dataset caches its generated sample list into the package dir;
    # remove it afterwards so other runs regenerate from their own root
    cache = _sample_list_path("staticthings3d.robust_mvd.mvd")
    assert not osp.exists(cache), "stale cached ST3D sample list in package"
    try:
        # root points at the TRAIN split dir (sequences live at <root>/A/0000)
        ds = create_dataset(
            "staticthings3d.robust_mvd.mvd", root=str(tmp_path / "TRAIN"), verbose=False
        )
        # frames 0..8, keyframes 6..8 with 4 source offsets in range:
        # C(8,4) + C(7,4) + C(6,4) = 70 + 35 + 15
        assert len(ds) == 120, len(ds)
        out = ds[0]
        assert len(out["images"]) == 5 and out["images"][0].shape == (3, H, W)
        assert out["depth"].shape == (1, H, W)
        assert "invdepth" in out and "depth_range" in out
        kv = out["keyview_idx"]
        np.testing.assert_allclose(out["poses"][kv], np.eye(4), atol=1e-5)
    finally:
        if osp.exists(cache):
            os.remove(cache)


def test_blendedmvs_dataset_generation(tmp_path, rng):
    """Drive the full BlendedMVS training-dataset machinery: scene scan ->

    pair.txt top-4 source combinations -> every-2nd-sample 'small' split ->
    Sample.load (reference: blendedmvs.py:293-468)."""
    from tests_common import random_pose_np

    from robustmvd_tpu.data import create_dataset
    from robustmvd_tpu.data.blendedmvs import BMVS_TRAIN_SCENES
    from robustmvd_tpu.data.dataset import _sample_list_path

    scene = BMVS_TRAIN_SCENES[0]  # the split filters to the real scene list
    base = tmp_path / scene
    H, W = 16, 24
    view_ids = list(range(5))
    for v in view_ids:
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
        f.write("0\n4 1 9.0 2 8.0 3 7.0 4 6.0\n")
        f.write("1\n4 0 9.0 2 8.0 3 7.0 4 6.0\n")

    cache = _sample_list_path("blendedmvs.robust_mvd.mvd")
    assert not osp.exists(cache), "stale cached BlendedMVS sample list"
    try:
        ds = create_dataset(
            "blendedmvs.robust_mvd.mvd", root=str(tmp_path), verbose=False
        )
        # 2 keys x C(10,4) padded-source combos = 420, every 2nd -> 210
        assert len(ds) == 210, len(ds)
        out = ds[0]
        assert len(out["images"]) == 5
        assert out["images"][0].shape == (3, H, W)
        assert out["depth"].shape == (1, H, W)
        assert out["depth_range"][0] > 0
        assert "invdepth" in out
    finally:
        if osp.exists(cache):
            os.remove(cache)


def test_flyingthings3d_dataset_generation(tmp_path, rng):
    """FT3D training dataset: sequence scan, npy calib, PFM disparity ->

    depth = 1050 / -disparity with negative/inf scrub
    (reference: flyingthings3d.py:803-1034)."""
    from tests_common import random_pose_np

    from robustmvd_tpu.data import create_dataset
    from robustmvd_tpu.data.dataset import _sample_list_path

    seq = tmp_path / "TRAIN" / "A" / "0000"
    H, W = 16, 24
    K = np.array([[1050, 0, W / 2], [0, 1050, H / 2], [0, 0, 1]], np.float32)
    for fn in range(0, 9):
        _write_png(
            str(seq / "frames_cleanpass" / "left" / f"{fn:04d}.png"),
            (rng.rand(H, W, 3) * 255).astype(np.uint8),
        )
        disp = -(rng.rand(H, W) * 50 + 10).astype(np.float32)  # negative convention
        if fn == 6:
            disp[0, 0] = 0.0  # -> inf depth -> scrubbed to 0
        _write_pfm(str(seq / "disparities" / "left" / f"{fn:04d}.pfm"), disp)
        os.makedirs(seq / "intrinsics" / "left", exist_ok=True)
        os.makedirs(seq / "poses" / "left", exist_ok=True)
        np.save(str(seq / "intrinsics" / "left" / f"{fn:04d}.npy"), K)
        np.save(str(seq / "poses" / "left" / f"{fn:04d}.npy"), random_pose_np(rng))

    cache = _sample_list_path("flyingthings3d.robust_mvd.mvd")
    assert not osp.exists(cache), "stale cached FT3D sample list"
    try:
        ds = create_dataset(
            "flyingthings3d.robust_mvd.mvd", root=str(tmp_path / "TRAIN"), verbose=False
        )
        assert len(ds) > 0
        out = ds[0]
        assert len(out["images"]) == 5
        assert out["depth"].shape == (1, H, W)
        # depth = 1050/-disp is positive; the zero-disparity pixel scrubbed
        key_depths = out["depth"][out["depth"] > 0]
        assert key_depths.size > 0 and (key_depths < 1050 / 10 + 1).all()
        assert "invdepth" in out
    finally:
        if osp.exists(cache):
            os.remove(cache)
