"""Host utils: collate, view indexing, geometry (reference:

rmvd/utils/utils.py:92-369, rmvd/data/dataset.py:343-367)."""

import numpy as np
import pytest

from robustmvd_tpu.utils import (
    add_batch_dim,
    compute_depth_range,
    exclude_index,
    invert_transform,
    numpy_collate,
    rebase_poses_to_key,
    remove_batch_dim,
    select_by_index,
    to_relative_intrinsics,
)
from tests_common import random_pose_np


def test_numpy_collate_dict_of_lists():
    s1 = {"images": [np.zeros((3, 4, 4)), np.ones((3, 4, 4))], "keyview_idx": 0}
    s2 = {"images": [np.ones((3, 4, 4)), np.zeros((3, 4, 4))], "keyview_idx": 1}
    batch = numpy_collate([s1, s2])
    assert isinstance(batch["images"], list) and len(batch["images"]) == 2
    assert batch["images"][0].shape == (2, 3, 4, 4)
    assert batch["keyview_idx"].tolist() == [0, 1]


def test_add_remove_batch_dim():
    sample = {"a": np.arange(6).reshape(2, 3), "l": [np.ones(3)], "i": 5}
    batched = add_batch_dim(sample)
    assert batched["a"].shape == (1, 2, 3)
    restored = remove_batch_dim(batched)
    np.testing.assert_array_equal(restored["a"], sample["a"])
    np.testing.assert_array_equal(restored["l"][0], sample["l"][0])


def test_select_exclude_index_batched():
    views = [np.full((2, 3), i, np.float32) for i in range(4)]
    idx = np.array([1, 3])
    sel = select_by_index(views, idx)
    np.testing.assert_array_equal(sel[:, 0], [1, 3])
    exc = exclude_index(views, idx)
    assert len(exc) == 3
    np.testing.assert_array_equal(exc[0][:, 0], [0, 0])
    np.testing.assert_array_equal(exc[1][:, 0], [2, 1])
    np.testing.assert_array_equal(exc[2][:, 0], [3, 2])


def test_invert_transform():
    T = random_pose_np(np.random.RandomState(0))
    np.testing.assert_allclose(invert_transform(T) @ T, np.eye(4), atol=1e-5)


def test_rebase_poses_to_key():
    rng = np.random.RandomState(1)
    to_ref = [random_pose_np(rng) for _ in range(3)]
    rebased = rebase_poses_to_key(to_ref, keyview_idx=1)
    # key pose becomes identity; product order is to_ref @ inv(key_to_ref)
    np.testing.assert_allclose(rebased[1], np.eye(4), atol=1e-5)
    np.testing.assert_allclose(
        rebased[0], to_ref[0] @ np.linalg.inv(to_ref[1]), atol=1e-4
    )


def test_compute_depth_range():
    depth = np.zeros((1, 10, 10), np.float32)
    depth[0, :5] = 2.0
    depth[0, 5:] = 8.0
    rng_ = compute_depth_range(depth=depth)
    assert rng_[0] == pytest.approx(2.0)
    assert rng_[1] == pytest.approx(8.0)


def test_relative_intrinsics_roundtrip():
    K = np.array([[500, 0, 320], [0, 480, 240], [0, 0, 1]], np.float32)
    K_rel = to_relative_intrinsics(K, 640, 480)
    assert K_rel[0, 0] == pytest.approx(500 / 640)
    assert K_rel[1, 2] == pytest.approx(0.5)
