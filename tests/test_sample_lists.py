"""Compat unpickler: the reference's bundled golden sample manifests must

load into this package's Sample classes (robustmvd_tpu/data/dataset.py
`_CompatUnpickler`)."""

import os.path as osp

import pytest

from robustmvd_tpu.data.dataset import load_sample_list

REF_LISTS = "/root/reference/rmvd/data/sample_lists"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF_LISTS), reason="reference sample lists not available"
)


@pytest.mark.parametrize(
    "name,expected_count,cls_name",
    [
        ("kitti.robustmvd.mvd", 93, "KITTISample"),
        ("eth3d.robustmvd.mvd", 104, "ETH3DSample"),
        ("dtu.robustmvd.mvd", 110, "DTUSample"),
        ("scannet.robustmvd.mvd", 200, "ScanNetSample"),
        ("tanks_and_temples.robustmvd.mvd", 69, "TanksAndTemplesSample"),
    ],
)
def test_load_reference_sample_list(name, expected_count, cls_name):
    samples = load_sample_list(osp.join(REF_LISTS, f"{name}.pickle"))
    assert len(samples) == expected_count
    assert type(samples[0]).__name__ == cls_name
    assert hasattr(samples[0], "data")
    # every sample carries the universal keys
    for key in ("images", "poses", "intrinsics"):
        assert key in samples[0].data


def test_bundled_native_sample_lists():
    """The package ships natively re-serialized golden manifests; dataset

    classes construct from them without data on disk."""
    from robustmvd_tpu.data import create_dataset

    for name, count in [
        ("kitti.robustmvd.mvd", 93),
        ("eth3d.robustmvd.mvd", 104),
        ("dtu.robustmvd.mvd", 110),
        ("scannet.robustmvd.mvd", 200),
        ("tanks_and_temples.robustmvd.mvd", 69),
    ]:
        ds = create_dataset(name, verbose=False)
        assert len(ds) == count, name
