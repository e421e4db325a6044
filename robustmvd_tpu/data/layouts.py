"""Default viewer layouts (reference parity: rmvd/data/layouts.py:9-262).

The reference returns iviz/itypes display objects for its PyQt GUI; this
framework's lightweight viewer consumes plain numpy arrays, so load
functions return ``{"data": ndarray, "kind": str}``.
"""

from __future__ import annotations

import math

import numpy as np

from .layout import Layout, Visualization


def _image(sample_dict, idx):
    img = sample_dict["images"][idx]
    return {"data": np.clip(img.transpose(1, 2, 0), 0, 255).astype(np.uint8), "kind": "image"}


def _float_map(arr):
    return {"data": arr.transpose(1, 2, 0) if arr.ndim == 3 else arr, "kind": "float"}


class MVDSequentialDefaultLayout(Layout):
    """Key image + GT maps + up to 2 source views fore/aft

    (reference: layouts.py:9-105)."""

    def __init__(self, name, num_views, keyview_idx):
        self.num_views = num_views
        self.keyview_idx = keyview_idx
        super().__init__(name=name)

        max_fwd = min(2, num_views - keyview_idx - 1)
        max_bwd = min(2, keyview_idx)

        self.visualizations.append(
            Visualization(2, 0, "image", lambda s: _image(s, s["keyview_idx"]), "Key Image")
        )
        self.visualizations.append(
            Visualization(2, 1, "float", lambda s: _float_map(s["depth"]), "GT Depth")
        )
        self.visualizations.append(
            Visualization(3, 1, "float", lambda s: _float_map(s["invdepth"]), "GT Inverse Depth")
        )
        self.visualizations.append(
            Visualization(
                4, 1, "mask",
                lambda s: _float_map((s["depth"] > 0).astype(np.float32)),
                "GT Mask",
            )
        )
        for i in list(range(-max_bwd, 0)) + list(range(1, 1 + max_fwd)):
            self.visualizations.append(
                Visualization(
                    2 + i, 0, "image",
                    lambda s, idx=i: _image(s, s["keyview_idx"] + idx),
                    f"Source Image @{'+' if i > 0 else ''}{i}",
                )
            )


class MVDUnstructuredDefaultLayout(Layout):
    """Key image + GT maps + first max_views source views in a grid

    (reference: layouts.py:107-210)."""

    def __init__(self, name, num_views, max_views):
        self.num_views = num_views
        self.max_views = max_views
        self.keyview_idx = 0
        super().__init__(name=name)

        per_row = 5
        n = min(num_views, max_views)

        self.visualizations.append(
            Visualization(0, 0, "image", lambda s: _image(s, s["keyview_idx"]), "Key Image")
        )
        self.visualizations.append(
            Visualization(0, 1, "float", lambda s: _float_map(s["depth"]), "GT Depth")
        )
        self.visualizations.append(
            Visualization(1, 1, "float", lambda s: _float_map(s["invdepth"]), "GT Inverse Depth")
        )
        self.visualizations.append(
            Visualization(
                2, 1, "mask",
                lambda s: _float_map((s["depth"] > 0).astype(np.float32)),
                "GT Mask",
            )
        )
        col, row = 1, 0
        for i in range(1, n):
            self.visualizations.append(
                Visualization(
                    col, row + 2 * (col // per_row), "image",
                    lambda s, idx=i: _image(s, idx),
                    f"Source Image {i}",
                )
            )
            col += 1


class EvalMVDLayout(Layout):
    """Evaluation qualitatives layout: key image + GT maps + prediction

    overlays written back by the eval engine as dataset updates
    (reference: multi_view_depth_evaluation.py:732-863 `_get_layout`)."""

    def __init__(self, name="eval_mvd", eval_uncertainty=True):
        super().__init__(name=name)
        self.visualizations.append(
            Visualization(0, 0, "image", lambda s: _image(s, s["keyview_idx"]), "Key Image")
        )
        self.visualizations.append(
            Visualization(0, 1, "float", lambda s: _float_map(s["depth"]), "GT Depth")
        )
        self.visualizations.append(
            Visualization(1, 1, "float", lambda s: _float_map(s["invdepth"]), "GT Inverse Depth")
        )
        self.visualizations.append(
            Visualization(
                2, 1, "mask",
                lambda s: _float_map((s["depth"] > 0).astype(np.float32)),
                "GT Mask",
            )
        )
        self.visualizations.append(
            Visualization(0, 2, "float", lambda s: _float_map(s["pred_depth"]), "Predicted Depth")
        )
        self.visualizations.append(
            Visualization(1, 2, "float", lambda s: _float_map(s["pred_invdepth"]), "Predicted Inverse Depth")
        )
        self.visualizations.append(
            Visualization(2, 2, "float", lambda s: _float_map(s["pointwise_absrel"]), "Absolute Relative Error")
        )
        if eval_uncertainty:
            self.visualizations.append(
                Visualization(
                    3, 2, "float",
                    lambda s: _float_map(s["pred_depth_uncertainty"]),
                    "Predicted Depth Uncertainty",
                )
            )


class AllImagesLayout(Layout):
    """All views in a grid (reference: layouts.py:213-262)."""

    def __init__(self, name, num_views):
        self.num_views = num_views
        super().__init__(name=name)

        per_row = 5
        for i in range(num_views):
            self.visualizations.append(
                Visualization(
                    i % per_row, i // per_row, "image",
                    lambda s, idx=i: _image(s, idx),
                    f"Image {i}",
                )
            )
