"""PatchmatchNet wrapped model (reference parity:

rmvd/models/wrappers/patchmatchnet.py)."""

from __future__ import annotations

import os.path as osp

import numpy as np

from ...utils import exclude_index, select_by_index, to_numpy
from ..registry import register_model
from .wrappers import ModelWrappers, add_repo_to_path


class PatchmatchNetWrapped(ModelWrappers):
    def __init__(self, num_sampling_steps=192):
        import torch

        repo_path = add_repo_to_path("patchmatchnet")
        from models.net import PatchmatchNet  # from the patchmatchnet repo

        self.torch = torch
        self.model = PatchmatchNet(
            patchmatch_interval_scale=[0.005, 0.0125, 0.025],
            propagation_range=[6, 4, 2],
            patchmatch_iteration=[1, 2, 2],
            patchmatch_num_sample=[8, 8, 16],
            propagate_neighbors=[0, 8, 16],
            evaluate_neighbors=[9, 9, 9],
        )
        state = torch.load(
            osp.join(repo_path, "checkpoints", "params_000007.ckpt"), map_location="cpu"
        )["model"]
        self.model.load_state_dict({k[7:]: v for k, v in state.items()})
        self.model.eval()
        self.num_sampling_steps = num_sampling_steps

    def input_adapter(self, images, keyview_idx, poses=None, intrinsics=None, depth_range=None):
        images = [img / 255.0 for img in images]
        if depth_range is None:
            depth_range = [
                np.array([0.2], dtype=np.float32),
                np.array([100], dtype=np.float32),
            ]
        min_depth, max_depth = depth_range
        return {
            "images": images,
            "poses": poses,
            "intrinsics": intrinsics,
            "keyview_idx": keyview_idx,
            "min_depth": min_depth,
            "max_depth": max_depth,
        }

    def __call__(self, images, poses, intrinsics, keyview_idx, min_depth, max_depth, **_):
        torch = self.torch
        image_key = select_by_index(images, keyview_idx)
        images_src = exclude_index(images, keyview_idx)
        K_key = select_by_index(intrinsics, keyview_idx)
        K_src = exclude_index(intrinsics, keyview_idx)
        pose_key = select_by_index(poses, keyview_idx)
        poses_src = exclude_index(poses, keyview_idx)

        with torch.no_grad():
            imgs = [torch.from_numpy(np.ascontiguousarray(image_key)).float()] + [
                torch.from_numpy(np.ascontiguousarray(i)).float() for i in images_src
            ]
            intr = torch.from_numpy(
                np.stack([K_key] + list(K_src), 1)
            ).float()
            ext = torch.from_numpy(np.stack([pose_key] + list(poses_src), 1)).float()
            depth, confidence, _ = self.model.forward(
                imgs,
                intr,
                ext,
                torch.from_numpy(np.asarray(min_depth).reshape(-1)).float(),
                torch.from_numpy(np.asarray(max_depth).reshape(-1)).float(),
            )
        pred = {
            "depth": depth.numpy(),
            "depth_uncertainty": (1 - confidence.unsqueeze(1)).numpy(),
        }
        return pred, {}

    def output_adapter(self, model_output):
        pred, aux = model_output
        return to_numpy(pred), to_numpy(aux)


@register_model(trainable=False)
def patchmatchnet_wrapped(pretrained=True, weights=None, train=False, **kwargs):
    assert pretrained and weights is None
    return PatchmatchNetWrapped(num_sampling_steps=kwargs.get("num_sampling_steps", 192))
