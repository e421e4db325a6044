"""Dataset registry name parsing — the reference's own test surface

(reference: tests/test_datasets.py:4-83) plus loader/collate round-trips
on a synthetic on-disk dataset."""

import numpy as np
import pytest

import robustmvd_tpu.data as data
from robustmvd_tpu.data import registry


def test_build_dataset_names():
    assert registry._build_dataset_name("eth3d.robustmvd.mvd") == "eth3d.robustmvd.mvd"
    assert (
        registry._build_dataset_name("eth3d.robustmvd.mvd", dataset_type="mvd")
        == "eth3d.robustmvd.mvd"
    )
    assert (
        registry._build_dataset_name("eth3d.robustmvd.mvd", split="robustmvd")
        == "eth3d.robustmvd.mvd"
    )
    assert (
        registry._build_dataset_name(
            "eth3d.robustmvd.mvd", dataset_type="mvd", split="robustmvd"
        )
        == "eth3d.robustmvd.mvd"
    )
    assert (
        registry._build_dataset_name("eth3d.robustmvd", dataset_type="mvd")
        == "eth3d.robustmvd.mvd"
    )
    assert (
        registry._build_dataset_name("eth3d.mvd", split="robustmvd")
        == "eth3d.robustmvd.mvd"
    )
    assert registry._build_dataset_name("eth3d.mvd") == "eth3d.robustmvd.mvd"
    assert (
        registry._build_dataset_name("eth3d", dataset_type="mvd", split="robustmvd")
        == "eth3d.robustmvd.mvd"
    )
    assert registry._build_dataset_name("eth3d.robustmvd") == "eth3d.robustmvd"
    assert registry._build_dataset_name("eth3d") == "eth3d"


def test_split_dataset_names():
    f = registry._split_dataset_name
    assert f("eth3d.robustmvd.mvd", None, None) == ("eth3d", "mvd", "robustmvd")
    assert f("eth3d.robustmvd", "mvd", None) == ("eth3d", "mvd", "robustmvd")
    assert f("eth3d", "mvd", "robustmvd") == ("eth3d", "mvd", "robustmvd")
    assert f("eth3d.robustmvd", "mvd", "robustmvd") == ("eth3d", "mvd", "robustmvd")
    assert f("eth3d.mvd", "mvd", "robustmvd") == ("eth3d", "mvd", "robustmvd")
    assert f("eth3d.mvd", None, "robustmvd") == ("eth3d", "mvd", "robustmvd")
    assert f("eth3d.mvd", None, None) == ("eth3d", "mvd", "robustmvd")
    assert f("eth3d", "mvd", None) == ("eth3d", "mvd", "robustmvd")


def test_registered_benchmark_datasets():
    for name in (
        "kitti.robustmvd.mvd",
        "eth3d.robustmvd.mvd",
        "dtu.robustmvd.mvd",
        "scannet.robustmvd.mvd",
        "tanks_and_temples.robustmvd.mvd",
        "staticthings3d.robust_mvd.mvd",
        "blendedmvs.robust_mvd.mvd",
        "flyingthings3d.robust_mvd.mvd",
        "dtu.train_mvsnet.mvd",
        "blendedmvs.train_mvsnet.mvd",
    ):
        assert data.has_dataset(name), name


def test_augmentations_registered():
    augs = data.list_augmentations()
    for name in (
        "robust_mvd_augmentations_staticthings3d",
        "robust_mvd_augmentations_blendedmvs",
        "mvsnet_augmentations",
        "supervised_monodepth2_augmentations",
        "dpt_augmentations",
        "mvsnet_sai_augmentations",
    ):
        assert name in augs, name
    assert "robust_mvd_batch_augmentations" in data.list_batch_augmentations()
