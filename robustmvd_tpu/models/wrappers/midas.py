"""MiDaS wrapped model (reference parity: rmvd/models/wrappers/midas.py:20-97).

Single-view inverse depth; evaluated with ``least_squares_scale_shift``
alignment. Requires the external MiDaS repo configured in paths.toml.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from ...utils import select_by_index, to_numpy
from ..registry import register_model
from .wrappers import ModelWrappers, add_repo_to_path


class MidasWrapped(ModelWrappers):
    def __init__(self, weights_name):
        import torch

        repo_path = add_repo_to_path("midas")
        from midas.midas_net import MidasNet
        from midas.transforms import NormalizeImage, PrepareForNet, Resize

        self.torch = torch
        weights_path = osp.join(repo_path, "weights", weights_name)
        self.model = MidasNet(weights_path, non_negative=True)
        self.model.eval()

        net_w = net_h = 384
        self._resize = Resize(
            net_w,
            net_h,
            resize_target=None,
            keep_aspect_ratio=True,
            ensure_multiple_of=32,
            resize_method="upper_bound",
        )
        self._normalize = NormalizeImage(
            mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]
        )
        self._prepare = PrepareForNet()

    def input_adapter(self, images, keyview_idx, poses=None, intrinsics=None, depth_range=None):
        image_batch = select_by_index(images, keyview_idx)
        out = []
        for image in image_batch:
            x = {"image": np.transpose(image / 255.0, (1, 2, 0))}
            x = self._resize(x)
            x = self._normalize(x)
            x = self._prepare(x)
            out.append(x["image"])
        return {"image": np.stack(out)}

    def __call__(self, image, **_):
        torch = self.torch
        with torch.no_grad():
            pred_invdepth = self.model(torch.from_numpy(image).float())
        return pred_invdepth.numpy()

    def output_adapter(self, model_output):
        pred_invdepth = to_numpy(model_output)
        with np.errstate(divide="ignore", invalid="ignore"):
            pred_depth = 1 / pred_invdepth
        return {"depth": pred_depth[:, None]}, {}


@register_model(trainable=False)
def midas_big_v2_1_wrapped(pretrained=True, weights=None, train=False, **kwargs):
    assert pretrained and weights is None
    return MidasWrapped(weights_name="midas_v21-f6b98070.pt")
