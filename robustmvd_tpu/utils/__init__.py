from .conversion import (
    add_batch_dim,
    batched_index,
    exclude_index,
    numpy_collate,
    remove_batch_dim,
    select_by_index,
    to_jax,
    to_numpy,
)
from .geometry import (
    compute_depth_range,
    from_relative_intrinsics,
    invert_transform,
    rebase_poses_to_key,
    scale_intrinsics,
    to_relative_intrinsics,
    transform_from_rot_trans,
)
from .image import resize_bilinear, resize_nearest
from .paths import get_path, load_paths
from .utils_misc import NanError, check_finite, get_full_class_name, prepend_level, set_random_seed
from . import logging

__all__ = [
    "add_batch_dim",
    "batched_index",
    "exclude_index",
    "numpy_collate",
    "remove_batch_dim",
    "select_by_index",
    "to_jax",
    "to_numpy",
    "compute_depth_range",
    "from_relative_intrinsics",
    "invert_transform",
    "rebase_poses_to_key",
    "scale_intrinsics",
    "to_relative_intrinsics",
    "transform_from_rot_trans",
    "resize_bilinear",
    "resize_nearest",
    "get_path",
    "load_paths",
    "get_full_class_name",
    "prepend_level",
    "set_random_seed",
    "NanError",
    "check_finite",
    "logging",
]
