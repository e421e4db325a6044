"""End-to-end dataset loading from synthetic on-disk trees: build a tiny

KITTI-format scene on disk and drive the Sample loaders + preprocessing +
loader pipeline (reference formats: rmvd/data/kitti.py:11-59)."""

import numpy as np
import pytest

from robustmvd_tpu.data.kitti import KITTIDepth, KITTIImage, KITTISample
from robustmvd_tpu.data.dataset import _preprocess_sample
from robustmvd_tpu.utils import numpy_collate


@pytest.fixture
def kitti_tree(tmp_path, rng):
    from PIL import Image

    root = tmp_path / "kitti"
    (root / "img").mkdir(parents=True)
    (root / "depth").mkdir()

    H, W = 32, 48
    for i in range(3):
        arr = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "img" / f"{i}.png")

    depth16 = (rng.rand(H, W) * 20000 + 300).astype(np.uint16)
    depth16[:4] = 0  # invalid band
    Image.fromarray(depth16).save(root / "depth" / "key.png")
    return str(root), H, W


def test_kitti_sample_load_and_preprocess(kitti_tree, rng):
    root, H, W = kitti_tree
    from tests_common import random_pose_np

    sample = KITTISample(name="seq/key01")
    sample.data["images"] = [KITTIImage(f"img/{i}.png") for i in range(3)]
    sample.data["poses"] = [np.eye(4, dtype=np.float32)] + [
        random_pose_np(rng) for _ in range(2)
    ]
    sample.data["intrinsics"] = [np.eye(3, dtype=np.float32) * 100 for _ in range(3)]
    sample.data["depth"] = KITTIDepth("depth/key.png")
    sample.data["keyview_idx"] = 1

    out = sample.load(root)
    assert len(out["images"]) == 3
    assert out["images"][0].shape == (3, H, W)
    assert out["depth"].shape == (1, H, W)
    assert (out["depth"][0, :4] == 0).all()  # invalid zeros preserved

    _preprocess_sample(out)
    # pose rebasing: key pose is identity afterwards
    np.testing.assert_allclose(out["poses"][1], np.eye(4), atol=1e-5)
    assert "invdepth" in out and "depth_range" in out
    assert out["depth_range"][0] > 0

    # batchable through the collate
    batch = numpy_collate([out, out])
    assert batch["images"][0].shape == (2, 3, H, W)
    assert batch["depth"].shape == (2, 1, H, W)
