from .sampling import bilinear_sample, grid_sample_normalized, warp
from .epipolar import (
    EpipolarCoeffs,
    make_epipolar_coeffs,
    planesweep_points,
    sampling_invdepths,
)
from .corr import planesweep_correlation, planesweep_correlation_single
from .reductions import depth_regression, entropy, groupwise_correlation, soft_argmin
from .interpolate import resize_bilinear, resize_nearest

__all__ = [
    "bilinear_sample",
    "grid_sample_normalized",
    "warp",
    "EpipolarCoeffs",
    "make_epipolar_coeffs",
    "planesweep_points",
    "sampling_invdepths",
    "planesweep_correlation",
    "planesweep_correlation_single",
    "depth_regression",
    "entropy",
    "groupwise_correlation",
    "soft_argmin",
    "resize_bilinear",
    "resize_nearest",
]
