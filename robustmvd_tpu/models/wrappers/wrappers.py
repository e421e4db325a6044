"""Wrapped-model adapter protocol.

Reference parity (rmvd/models/wrappers/wrappers.py:8-21 + the per-model
wrappers): inference-only adapters around external (torch) repositories.
A wrapped model implements ``input_adapter`` / ``forward`` /
``output_adapter``; the eval engine drives it through the same duck-typed
protocol as native models (``prepare_custom_model``). External repo paths
resolve from ``paths.toml`` next to this file, like the reference.

The wrapped models run their original torch implementations on CPU (this
framework's device path is jax/TPU; external CUDA repos are host-side
guests here). They exist for benchmark-comparison parity — the native
TPU models are the production path.
"""

from __future__ import annotations

import abc
import os.path as osp
import sys
import tomllib

import numpy as np

from ...utils import add_batch_dim, remove_batch_dim

PATHS_FILE = osp.join(osp.dirname(osp.realpath(__file__)), "paths.toml")


def get_wrapper_path(*keys):
    """Resolve an external repo path from wrappers/paths.toml."""
    if not osp.isfile(PATHS_FILE):
        return None
    with open(PATHS_FILE, "rb") as f:
        node = tomllib.load(f)
    for key in keys:
        if not isinstance(node, dict) or key not in node:
            return None
        node = node[key]
    return node


def add_repo_to_path(name):
    """sys.path-insert an external repo (reference wrapper pattern)."""
    repo = get_wrapper_path(name, "root")
    if repo is None or not osp.isdir(repo):
        raise FileNotFoundError(
            f"External repository for '{name}' not found. Configure its root in "
            f"{PATHS_FILE} and run the corresponding setup script in "
            f"robustmvd_tpu/models/wrappers/scripts/."
        )
    if repo not in sys.path:
        sys.path.insert(0, repo)
    return repo


class ModelWrappers(abc.ABC):
    """The wrapped-model protocol (reference: wrappers.py:8-21)."""

    name: str = ""
    trainable: bool = False

    @abc.abstractmethod
    def input_adapter(self, images, keyview_idx, poses=None, intrinsics=None, depth_range=None):
        ...

    @abc.abstractmethod
    def __call__(self, **sample):
        ...

    @abc.abstractmethod
    def output_adapter(self, model_output):
        ...

    def run(self, images, keyview_idx, poses=None, intrinsics=None, depth_range=None, **_):
        no_batch_dim = images[0].ndim == 3
        if no_batch_dim:
            images, keyview_idx, poses, intrinsics, depth_range = add_batch_dim(
                [images, keyview_idx, poses, intrinsics, depth_range]
            )
        sample = self.input_adapter(
            images=images,
            keyview_idx=keyview_idx,
            poses=poses,
            intrinsics=intrinsics,
            depth_range=depth_range,
        )
        output = self(**sample)
        pred, aux = self.output_adapter(output)
        if no_batch_dim:
            pred, aux = remove_batch_dim((pred, aux))
        return pred, aux

    def num_parameters(self):
        model = getattr(self, "model", None)
        if model is not None and hasattr(model, "parameters"):
            return sum(int(np.prod(p.shape)) for p in model.parameters())
        return 0
