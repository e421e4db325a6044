"""SE(3) / camera geometry helpers (host-side numpy + device-side jnp variants).

Capability parity with the reference framework's geometry utilities
(reference: rmvd/utils/utils.py:92-103 `transform_from_rot_trans` /
`invert_transform`, rmvd/utils/utils.py:22-41 `compute_depth_range`,
rmvd/data/dataset.py:343-367 pose rebasing), re-designed as pure functions
that work on both numpy arrays and jax arrays.
"""

from __future__ import annotations

import numpy as np


def transform_from_rot_trans(R, t):
    """Build a 4x4 homogeneous transform from a 3x3 rotation and 3-vector."""
    R = np.asarray(R, dtype=np.float32).reshape(3, 3)
    t = np.asarray(t, dtype=np.float32).reshape(3, 1)
    return np.vstack([np.hstack([R, t]), np.array([[0, 0, 0, 1]], dtype=np.float32)])


def invert_transform(T):
    """Invert a 4x4 rigid transform: inv([R|t]) = [R^T | -R^T t].

    Works on (..., 4, 4) stacks.
    """
    T = np.asarray(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = np.swapaxes(R, -1, -2)
    out = np.zeros_like(T)
    out[..., :3, :3] = Rt
    out[..., :3, 3:] = -Rt @ t
    out[..., 3, 3] = 1.0
    return out


def rebase_poses_to_key(to_ref_transforms, keyview_idx):
    """Rebase per-view extrinsics to the key view.

    Computes ``to_key[i] = to_ref[i] @ inv(to_ref[key])`` — the exact product
    order of the reference preprocessing (rmvd/data/dataset.py:362-367 and
    inference.py:40-41). With extrinsics ``X_view = E_view @ X_world``, the
    result maps *key-camera* points into view ``i``'s camera frame; the key
    view's own entry is identity. These are the "poses" of the sample
    contract, consumed directly by the plane-sweep projection.

    Args:
        to_ref_transforms: list/array of (4, 4) per-view transforms to a
            common reference frame.
        keyview_idx: index of the key view.

    Returns:
        list of (4, 4) float32 rebased transforms.
    """
    to_ref_transforms = [np.asarray(T, dtype=np.float32) for T in to_ref_transforms]
    key_to_ref = to_ref_transforms[int(keyview_idx)]
    ref_to_key = invert_transform(key_to_ref)
    return [T @ ref_to_key for T in to_ref_transforms]


def compute_depth_range(depth=None, invdepth=None, clipping_quantile=0.05):
    """Robust (min, max) depth range from a depth or inverse-depth map.

    Invalid pixels (<= 0 depth / non-finite) are ignored. The range is taken
    at the given lower/upper quantiles to be robust to outliers, mirroring the
    reference's sample preprocessing (rmvd/utils/utils.py:22-41).
    """
    if depth is None and invdepth is None:
        return None
    if depth is None:
        with np.errstate(divide="ignore", invalid="ignore"):
            depth = 1.0 / invdepth
    depth = np.asarray(depth)
    valid = np.isfinite(depth) & (depth > 0)
    if not np.any(valid):
        return None
    vals = depth[valid]
    lo = float(np.quantile(vals, clipping_quantile))
    hi = float(np.quantile(vals, 1.0 - clipping_quantile))
    return (lo, hi)


def scale_intrinsics(K, scale_x, scale_y):
    """Rescale a 3x3 intrinsics matrix for an image resized by (sx, sy).

    fx, cx scale with x; fy, cy scale with y (reference:
    rmvd/data/transforms.py:56-66).
    """
    K = np.array(K, dtype=np.float32, copy=True)
    K[..., 0, 0] *= scale_x
    K[..., 0, 2] *= scale_x
    K[..., 1, 1] *= scale_y
    K[..., 1, 2] *= scale_y
    return K


def to_relative_intrinsics(K, width, height):
    """Convert absolute-pixel intrinsics to relative (unit-image) intrinsics.

    Divides the x-row by image width and the y-row by image height
    (reference: rmvd/models/robust_mvd.py:118-120).
    """
    K = np.asarray(K, dtype=np.float32)
    scale = np.array(
        [[width] * 3, [height] * 3, [1.0] * 3], dtype=np.float32
    )
    return K / scale


def from_relative_intrinsics(K_rel, width, height):
    """Inverse of :func:`to_relative_intrinsics`."""
    K_rel = np.asarray(K_rel, dtype=np.float32)
    scale = np.array(
        [[width] * 3, [height] * 3, [1.0] * 3], dtype=np.float32
    )
    return K_rel * scale


def trans_from_transform(T):
    """Translation vector(s) of 4x4 transform(s) (reference:

    rmvd/utils/utils.py:84-85, batched: torchutils.py:64-79)."""
    import numpy as np

    T = np.asarray(T)
    return T[..., 0:3, 3]


def rot_from_transform(T):
    """Rotation block(s) of 4x4 transform(s) (reference:

    rmvd/utils/utils.py:88-89, batched: torchutils.py:82-97)."""
    import numpy as np

    T = np.asarray(T)
    return T[..., 0:3, 0:3]


def normalize(x, axis=None, eps=1e-9):
    """L2-normalize along ``axis`` (reference: rmvd/utils/utils.py:395-397;

    the reference's torch ``dim`` kwarg is accepted as an alias)."""
    import numpy as np

    norm = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / (norm + eps)
