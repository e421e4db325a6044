"""Closed-form epipolar plane-sweep geometry.

Projecting a key-view pixel ``(x, y)`` at inverse depth ``d`` into a source
view is a rational-linear function of ``d``:

    [u_h, v_h, k_h]^T = P @ [x, y, 1]^T + d * q,
    u = u_h / k_h,  v = v_h / k_h,

with ``P = K_src @ R @ K_key^{-1}`` and ``q = K_src @ t`` where ``[R|t]`` maps
key-camera points into the source camera frame. The reference derives the
same coefficients scalar-by-scalar (rmvd/models/blocks/planesweep_corr.py:
228-300 `EpipolarCoeffs.from_calib`); here we keep the matrix form, compute
the per-pixel parts once, and evaluate per-hypothesis coordinates with pure
VPU arithmetic — no trig, no per-hypothesis matmul.

Conventions (identical to the reference):
- Intrinsics are *relative* (divided by image width/height); they are scaled
  back to pixels of the feature map inside this module.
- Pixel centers sit at ``i + 0.5`` (planesweep_corr.py:233-237).
- The visibility mask requires the point in front of both cameras
  (planesweep_corr.py:499-506).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class EpipolarCoeffs(NamedTuple):
    """Per-view epipolar coefficients.

    uvk_inf: (B, H, W, 3) homogeneous coords at infinite depth (d=0),
        i.e. ``P @ [x, y, 1]`` per key pixel; last axis (u_h, v_h, k_h).
    m: (B, 3) depth-slope ``q = K_src @ t``; last axis (m_u, m_v, m_k).
    """

    uvk_inf: jnp.ndarray
    m: jnp.ndarray


def make_epipolar_coeffs(
    intrinsics_key,
    intrinsics_source,
    key_to_source_transform,
    height,
    width,
    height_source=None,
    width_source=None,
):
    """Compute epipolar coefficients for one source view.

    Args:
        intrinsics_key: (B, 3, 3) relative intrinsics of the key view.
        intrinsics_source: (B, 3, 3) relative intrinsics of the source view.
        key_to_source_transform: (B, 4, 4) transform taking key-camera points
            into the source camera frame. (This is the tensor the reference
            passes as ``source_to_key_transform`` — the sample contract stores
            cur->key poses and uses them in this direction,
            planesweep_corr.py:262-291.)
        height, width: key feature-map resolution (static ints).
        height_source, width_source: source feature-map resolution; defaults
            to the key resolution.

    Returns:
        EpipolarCoeffs with uvk_inf (B, H, W, 3) and m (B, 3).
    """
    if height_source is None:
        height_source = height
    if width_source is None:
        width_source = width

    dtype = intrinsics_key.dtype

    def absolute(K_rel, w, h):
        scale = jnp.asarray([[w, w, w], [h, h, h], [1.0, 1.0, 1.0]], dtype=dtype)
        return K_rel * scale

    K_key = absolute(intrinsics_key, width, height)
    K_src = absolute(intrinsics_source, width_source, height_source)

    R = key_to_source_transform[:, :3, :3]
    t = key_to_source_transform[:, :3, 3]

    # Closed-form inverse of the upper-triangular pinhole K (no skew).
    fx = K_key[:, 0, 0]
    fy = K_key[:, 1, 1]
    cx = K_key[:, 0, 2]
    cy = K_key[:, 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    K_key_inv = jnp.stack(
        [
            jnp.stack([1.0 / fx, zeros, -cx / fx], axis=-1),
            jnp.stack([zeros, 1.0 / fy, -cy / fy], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )

    P = K_src @ R @ K_key_inv  # (B, 3, 3)
    q = jnp.einsum("bij,bj->bi", K_src, t)  # (B, 3)

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=dtype) + 0.5,
        jnp.arange(width, dtype=dtype) + 0.5,
        indexing="ij",
    )
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (H, W, 3)
    uvk_inf = jnp.einsum("bij,hwj->bhwi", P, pix)  # (B, H, W, 3)

    return EpipolarCoeffs(uvk_inf=uvk_inf, m=q)


def sampling_invdepths(
    min_depth, max_depth, num_samples, sampling_type="linear_invdepth", dtype=jnp.float32
):
    """Inverse-depth hypothesis values, shape (B, S).

    ``linear_invdepth`` spaces hypotheses linearly from 1/max_depth to
    1/min_depth; ``linear_depth`` spaces depths linearly and returns the
    inverse depths in ascending order (reference:
    planesweep_corr.py:524-555 `compute_sampling_invdepths`).
    """
    min_depth = jnp.atleast_1d(jnp.asarray(min_depth, dtype=dtype))[..., None]  # (B,1)
    max_depth = jnp.atleast_1d(jnp.asarray(max_depth, dtype=dtype))[..., None]
    steps = jnp.arange(num_samples, dtype=dtype)[None, :]  # (1, S)

    if sampling_type == "linear_invdepth":
        min_inv = 1.0 / max_depth
        max_inv = 1.0 / min_depth
        return min_inv + steps * (max_inv - min_inv) / (num_samples - 1)
    elif sampling_type == "linear_depth":
        depths = min_depth + steps * (max_depth - min_depth) / (num_samples - 1)
        return (1.0 / depths)[:, ::-1]
    else:
        raise ValueError(f"unknown sampling_type: {sampling_type}")


def planesweep_points(coeffs: EpipolarCoeffs, invdepths):
    """Per-hypothesis sampling locations and visibility mask.

    Args:
        coeffs: per-view epipolar coefficients.
        invdepths: (B, S) or (B, S, H, W) inverse-depth hypotheses.

    Returns:
        us, vs: (B, S, H, W) source-view sampling coordinates in pixel-center
            convention. Non-finite values are replaced by +-1e9
            (reference: planesweep_corr.py:333-349, replace_nonfinite=True).
        mask: (B, S, H, W) bool visibility (in front of both cameras,
            reference: planesweep_corr.py:499-506).
    """
    uvk_inf = coeffs.uvk_inf  # (B, H, W, 3)
    m = coeffs.m  # (B, 3)

    if invdepths.ndim == 2:
        ds = invdepths[:, :, None, None]  # (B, S, 1, 1)
    else:
        ds = invdepths

    u_inf = uvk_inf[..., 0][:, None]  # (B, 1, H, W)
    v_inf = uvk_inf[..., 1][:, None]
    k_inf = uvk_inf[..., 2][:, None]
    m_u = m[:, 0][:, None, None, None]  # (B, 1, 1, 1)
    m_v = m[:, 1][:, None, None, None]
    m_k = m[:, 2][:, None, None, None]

    denom = k_inf + m_k * ds  # (B, S, H, W)
    us = (u_inf + m_u * ds) / denom
    vs = (v_inf + m_v * ds) / denom

    def fix(a):
        a = jnp.where(jnp.isinf(a), 1e9 * jnp.sign(a), a)
        return jnp.where(jnp.isnan(a), 1e9, a)

    us = fix(us)
    vs = fix(vs)

    # Visibility: point in front of the key camera (z = 1/d > 0) and in front
    # of the source camera (homogeneous denominator positive). For z > 0,
    # sign(k_inf + m_k*d) == sign(k_inf*z + m_k), which reproduces the
    # reference's z-pole case analysis (planesweep_corr.py:499-506).
    zs = 1.0 / ds
    visible_in_key = zs > 0
    visible_in_source = (k_inf * zs + m_k) > 0
    mask = visible_in_key & visible_in_source
    mask = jnp.broadcast_to(mask, us.shape)

    return us, vs, mask
