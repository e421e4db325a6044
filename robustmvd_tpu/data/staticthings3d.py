"""StaticThings3D dataset (reference parity: rmvd/data/staticthings3d.py).

``robust_mvd`` split: key frames 6-15, all C(12, 4) source-offset
combinations within +-6, hard-sample filtering, ``.float3`` readers
(reference: staticthings3d.py:139-315).
"""

from __future__ import annotations

import itertools
import json
import os.path as osp

import numpy as np

from .dataset import Dataset, Sample, _sample_list_path
from .layouts import AllImagesLayout, MVDUnstructuredDefaultLayout
from .registry import register_default_dataset
from .seqconf import DataConf, generate_sequence_samples

with open(osp.join(osp.dirname(__file__), "meta", "flyingthings3d_filters.json")) as _f:
    _FILTERS = json.load(_f)
HARD_SAMPLES = [tuple(x) for x in _FILTERS["hard_samples"]]


def read_float3(path):
    """lmb-freiburg ``.float3`` reader (reference: staticthings3d.py:18-35)."""
    with open(path, "rb") as f:
        if f.readline().decode("utf-8") != "float\n":
            raise ValueError(f"float file {path} did not contain <float> keyword")
        dim = int(f.readline())
        dims = []
        count = 1
        for _ in range(dim):
            d = int(f.readline())
            dims.append(d)
            count *= d
        dims = list(reversed(dims))
        return np.fromfile(f, np.float32, count).reshape(dims)


def _cam_dir(cam):
    return "left" if cam == "l" else "right"


def _load_image(root, cam, frame_num):
    from PIL import Image

    img = np.array(
        Image.open(osp.join(root, "frames_cleanpass", _cam_dir(cam), f"{frame_num:04d}.png"))
    )
    return img.transpose(2, 0, 1).astype(np.float32)


def _load_depth(root, cam, frame_num):
    depth = read_float3(osp.join(root, "depths", _cam_dir(cam), f"{frame_num:04d}.float3"))
    depth[(depth < 0.0) | np.isinf(depth) | np.isnan(depth)] = 0.0
    return depth[None].astype(np.float32)


def _load_intrinsics(root, cam, frame_num):
    return read_float3(
        osp.join(root, "intrinsics", _cam_dir(cam), f"{frame_num:04d}.float3")
    )


def _load_pose(root, cam, frame_num):
    return read_float3(osp.join(root, "poses", _cam_dir(cam), f"{frame_num:04d}.float3"))


def load(key, root, val):
    if isinstance(val, list):
        return [load(key, root, v) for v in val]
    if hasattr(val, "load"):
        return val.load(root)
    if isinstance(val, (np.ndarray, np.generic)):
        return val  # already-loaded data (poses/intrinsics in the manifests)
    if key == "images":
        return _load_image(root, *val)
    if key == "depth":
        return _load_depth(root, *val)
    if key == "intrinsics":
        return _load_intrinsics(root, *val)
    if key == "poses":
        return _load_pose(root, *val)
    return val


class StaticThings3DSample(Sample):
    def __init__(self, base, name):
        self.base = base
        self.name = name
        self.data = {}

    def load(self, root):
        base = osp.join(root, self.base)
        out = {"_base": base, "_name": self.name}
        for key, val in self.data.items():
            out[key] = load(key, base, val)
        return out


class StaticThings3D(Dataset):
    def _init_samples(self, sample_confs=None, filter_hard_samples=False, use_subset_only=False):
        path = _sample_list_path(self.name)
        if path is not None and osp.isfile(path):
            super()._init_samples_from_list()
        else:
            filtered = []
            if filter_hard_samples:
                filtered += HARD_SAMPLES
            if use_subset_only:
                filtered += [tuple(x) for x in _FILTERS["subset_filtered_samples"]]
            self.samples = generate_sequence_samples(
                self.root,
                sample_confs,
                StaticThings3DSample,
                filtered_ids=filtered,
                verbose=self.verbose,
            )
            self._write_samples_list(path)


@register_default_dataset
class StaticThings3DSeq4Train(StaticThings3D):
    base_dataset = "staticthings3d"
    split = "robust_mvd"
    dataset_type = "mvd"

    def __init__(self, root=None, layouts=None, **kwargs):
        root = root if root is not None else self._get_path("staticthings3d", "train", "root")
        default_layouts = [
            MVDUnstructuredDefaultLayout("default", num_views=5, max_views=5),
            AllImagesLayout("all_images", num_views=5),
        ]
        layouts = default_layouts + layouts if layouts is not None else default_layouts
        super().__init__(
            sample_confs=self._get_sample_confs(),
            filter_hard_samples=True,
            use_subset_only=False,
            root=root,
            layouts=layouts,
            **kwargs,
        )

    def _get_sample_confs(self):
        """All C(12,4) combinations of source offsets within +-6

        (reference: staticthings3d.py:285-315)."""
        sample_confs = []
        offset_list = [-6, -5, -4, -3, -2, -1, 1, 2, 3, 4, 5, 6]
        for offsets in itertools.combinations(offset_list, 4):
            images = [DataConf("frames_cleanpass", "left", 0)]
            poses = [DataConf("poses", "left", 0)]
            intrinsics = [DataConf("intrinsics", "left", 0)]
            for offset in offsets:
                images.append(DataConf("frames_cleanpass", "left", offset))
                poses.append(DataConf("poses", "left", offset))
                intrinsics.append(DataConf("intrinsics", "left", offset))
            sample_confs.append(
                {
                    "images": images,
                    "poses": poses,
                    "intrinsics": intrinsics,
                    "depth": DataConf("depths", "left", 0),
                    "keyview_idx": 0,
                }
            )
        return sample_confs
