"""Fused plane-sweep warp + variance as a banded MXU contraction.

Replaces the gather-based ``homo_warp`` + variance accumulation in the
MVSNet family's cost-volume stage (reference: rmvd/models/blocks/
utils.py:222-268 ``homo_warp`` + rmvd/models/mvsnet.py:124-137 variance
aggregation) with a single Pallas kernel that never gathers and never
materializes per-view warped volumes in HBM.

Formulation
-----------
Bilinear sampling with zeros padding is EXACTLY a separable tent-weight
contraction: for sample coordinate (xi, yi),

    warped[c] = sum_h sum_w max(0, 1-|h-yi|) * max(0, 1-|w-xi|) * src[h,w,c]

(out-of-image taps match no grid position and contribute 0 — the zeros
padding semantics). The x-tents for one (depth-block, ref-row) output
block are IDENTICAL for every source row, so the w-contraction is one
MXU matmul per band of source rows:

    out1[(band,c), p] = src_band[(band,c), :] @ tentx[:, p]

and the h-contraction is a cheap VPU reduce over the band with the
y-tents. The band [floor(min yi), floor(max yi)+1] is found per block
and covered by a dynamic fori_loop of BAND-row segments, so the kernel
is exact for arbitrary geometry (degenerate coords clamp to the image
range first; their tents are zero anyway). Per-view warped features,
the running sum and sum-of-squares live only in VMEM registers; the
variance volume is the only HBM write.

Layouts: source features are staged as (Hs+2*BAND, C, Ws) per view so a
band slice reshapes to the (BAND*C, Ws) matmul operand for free (both
merged dims are sublane-side); the per-block output transpose
(C, Dc*W) -> (Dc*W, C) rides the MXU via an identity contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def plane_sweep_matrices(src_projs, ref_proj_inv, depth_values):
    """Per-depth 3x3 warp matrices M_d = d * R + e3-column(T).

    ``homo_warp``'s point transform pts = R @ [x,y,1] * d + T is the 3x3
    matrix (d*R + T⊗e3ᵀ) applied to [x,y,1]: M_d[i,j] = d*R[i,j] for
    j<2 and d*R[i,2] + T[i] for j=2.

    Args:
        src_projs: (B, V, 4, 4) source projection matrices.
        ref_proj_inv: (B, 4, 4) inverse reference projection.
        depth_values: (B, D).

    Returns:
        (B, V, D, 3, 3) float32.
    """
    # explicit multiply-add contraction: true f32 on the VPU (an einsum
    # would ride the MXU whose "f32" is a multi-pass bf16 decomposition —
    # enough rounding to shift sampling coordinates; see ops/homography.py)
    a = src_projs.astype(jnp.float32)[:, :, :, :, None]  # (B,V,4,4,1)
    b = ref_proj_inv.astype(jnp.float32)[:, None, None]  # (B,1,1,4,4)
    t = jnp.sum(a * b, axis=3)  # (B,V,4,4) = src @ ref_inv
    R = t[:, :, :3, :3]  # (B, V, 3, 3)
    T = t[:, :, :3, 3]  # (B, V, 3)
    e3 = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    Tmat = T[..., :, None] * e3[None, None, None, :]  # (B, V, 3, 3)
    d = depth_values.astype(jnp.float32)[:, None, :, None, None]  # (B,1,D,1,1)
    return R[:, :, None] * d + Tmat[:, :, None]


def _warp_view(src_ref, v, coeffs, d_idx, lo, nseg, *, Dc, W, Ws, Hs, BAND, C, samp_dtype, precision, r, norm):
    """Banded warp of one source view -> (C, Dc*W) f32.

    ``lo``/``nseg`` are the precomputed band bounds for this block
    (computed host-side by :func:`_band_bounds` — keeping the dynamic
    loop bound out of the vector pipeline avoids a per-block
    vector->scalar sync). ``norm`` = (sx, sy, eps_z): index = p/(z+eps)*s
    - 0.5 — the homo_warp quirk uses s=N/(N-1), eps=0 (utils.py:256-262);
    Vis-MVSNet's ``interpolate`` path is s=1, eps=1e-9 (utils.py:154-186).
    """
    DcW = Dc * W
    sx, sy, eps_z = norm
    xf = (
        jax.lax.broadcasted_iota(jnp.int32, (1, DcW), 1) - d_idx * W
    ).astype(jnp.float32)
    rf = jnp.float32(1.0) * r  # traced scalar row index

    A = coeffs  # (9, DcW): rows M00..M22 expanded per lane
    px = A[0:1] * xf + A[1:2] * rf + A[2:3]
    py = A[3:4] * xf + A[4:5] * rf + A[5:6]
    pz = A[6:7] * xf + A[7:8] * rf + A[8:9]

    xi = px / (pz + eps_z) * sx - 0.5
    yi = py / (pz + eps_z) * sy - 0.5

    def fix(a):
        return jnp.where(jnp.isfinite(a), a, jnp.float32(1e9))

    xi = fix(xi)
    yi = fix(yi)

    # x-tents: shared by every source row — the matmul operand
    tentx = jnp.maximum(
        0.0,
        1.0
        - jnp.abs(
            jax.lax.broadcasted_iota(jnp.int32, (Ws, DcW), 0).astype(jnp.float32)
            - xi
        ),
    ).astype(samp_dtype)

    ypad = yi + jnp.float32(BAND)  # coords in the padded row space
    ib = jax.lax.broadcasted_iota(jnp.int32, (BAND, DcW), 0).astype(jnp.float32)

    def seg_body(i, warped):
        start = lo + BAND * i + BAND  # first padded row of this segment
        seg = src_ref[0, v, pl.ds(start, BAND), :, :]  # (BAND, C, Ws)
        out1 = jax.lax.dot_general(
            seg.reshape(BAND * C, Ws).astype(samp_dtype),
            tentx,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (BAND*C, DcW)
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(ib + jnp.float32(1.0) * start - ypad))
        return warped + jnp.sum(
            out1.reshape(BAND, C, DcW) * ty[:, None, :], axis=0
        )

    return jax.lax.fori_loop(
        0, nseg, seg_body, jnp.zeros((C, DcW), jnp.float32)
    )


def _band_bounds(mats, H, W, Hs, dc, band):
    """Per-(batch, view, depth-block, row) band start + segment count.

    Mirrors the kernel's coordinate math (same f32 values — the mats
    entries are identical; ~1-ulp op-order differences only matter at
    exact-integer boundaries where the tent weight is 0 anyway).

    Returns lo, nseg: (B, D//dc, H, V) int32.
    """
    B, V, Dp = mats.shape[:3]
    xs = jnp.arange(W, dtype=jnp.float32)
    rs = jnp.arange(H, dtype=jnp.float32)
    M = mats[..., None, None]  # (B,V,Dp,3,3,1,1)
    py = (
        M[:, :, :, 1, 0] * xs[None, None, None, None, :]
        + M[:, :, :, 1, 1] * rs[None, None, None, :, None]
        + M[:, :, :, 1, 2]
    )  # (B,V,Dp,H,W)
    pz = (
        M[:, :, :, 2, 0] * xs[None, None, None, None, :]
        + M[:, :, :, 2, 1] * rs[None, None, None, :, None]
        + M[:, :, :, 2, 2]
    )
    yi = py / pz * (Hs / (Hs - 1.0)) - 0.5
    yi = jnp.where(jnp.isfinite(yi), yi, jnp.float32(1e9))
    yc = jnp.clip(yi, -1.0, jnp.float32(Hs))
    lo_d = jnp.floor(jnp.min(yc, axis=-1))  # (B,V,Dp,H)
    hi_d = jnp.floor(jnp.max(yc, axis=-1)) + 1.0
    lo_b = jnp.min(lo_d.reshape(B, V, Dp // dc, dc, H), axis=3)
    hi_b = jnp.max(hi_d.reshape(B, V, Dp // dc, dc, H), axis=3)
    lo = lo_b.astype(jnp.int32)
    nseg = (hi_b.astype(jnp.int32) - lo + band) // band
    # (B, nblk, H, V)
    return (
        jnp.transpose(lo, (0, 2, 3, 1)),
        jnp.transpose(nseg, (0, 2, 3, 1)),
    )


def _sweep_kernel(
    *refs, Dc, W, Ws, Hs, BAND, C, V, samp_dtype, precision, dense, norm, agg, G
):
    if dense:
        src_ref, ref_ref, coeff_ref, valid_ref, lo_ref, nseg_ref, depth_ref, out_ref = refs
    else:
        src_ref, ref_ref, coeff_ref, valid_ref, lo_ref, nseg_ref, out_ref = refs
    DcW = Dc * W
    r = pl.program_id(2)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, DcW), 1) // W

    refv = jnp.concatenate(
        [ref_ref[0, 0].astype(jnp.float32)] * Dc, axis=1
    )  # (C, DcW)
    if agg == "variance":
        # ref view contributes once to both sums (reference: mvsnet.py:124-130)
        vsum = refv
        vsq = refv * refv
        count = jnp.float32(1.0)
    else:  # group-wise correlation against the ref (blocks/utils.py:71-88)
        acc = jnp.zeros((G, DcW), jnp.float32)

    if dense:
        # per-lane multiplier w (a depth or inverse depth): the projective
        # coefficients are affine in it, M = A + B*w. Scalar-sweep
        # fronto-parallel warps are B=R, A=T⊗e3, w=depth (homo_warp /
        # rt_planesweep_warp); Vis-MVSNet homographies are
        # H = A - B/(d+1e-9) folded into the same form with w=1/(d+1e-9)
        dk = pl.program_id(1)
        dvec = depth_ref[0, 0, dk].reshape(1, DcW).astype(jnp.float32)
    else:
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (Dc, DcW), 0) == d_idx
        ).astype(jnp.float32)
        # one-hot selection of f32 coefficients: HIGHEST keeps the f32
        # mantissa through the MXU (DEFAULT would round operands to bf16
        # and shift sampling coordinates by ~0.4%)
        all_coeffs = jax.lax.dot_general(
            coeff_ref[0, 0],
            sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (V*9, DcW)

    for v in range(V):
        if dense:
            A = [coeff_ref[0, v, k] for k in range(9)]
            Bc = [coeff_ref[0, v, 9 + k] for k in range(9)]
            coeffs = jnp.concatenate(
                [A[k] + Bc[k] * dvec for k in range(9)], axis=0
            )  # (9, DcW)
        else:
            coeffs = all_coeffs[9 * v : 9 * (v + 1)]
        warped = _warp_view(
            src_ref, v, coeffs, d_idx,
            lo_ref[0, 0, r, v], nseg_ref[0, 0, r, v],
            Dc=Dc, W=W, Ws=Ws, Hs=Hs, BAND=BAND, C=C,
            samp_dtype=samp_dtype, precision=precision, r=r, norm=norm,
        )
        val = valid_ref[pl.program_id(0), v]
        if agg == "variance":
            vsum = vsum + warped * val
            vsq = vsq + warped * warped * val
            count = count + val
        else:
            # sum over channels within each of G groups (exact group
            # split: C is a multiple of G, sublane-dim split is free)
            prod = (refv * warped * val).reshape(G, C // G, DcW)
            acc = acc + jnp.sum(prod, axis=1)

    if agg == "variance":
        out2d = vsq / count - (vsum / count) * (vsum / count)
        Cout = C
    else:
        out2d = acc
        Cout = G
    outc = out2d.astype(out_ref.dtype)

    # (Cout, DcW) -> (DcW, Cout) on the MXU via an exact identity contraction
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (Cout, Cout), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (Cout, Cout), 1)
    ).astype(outc.dtype)
    outT = jax.lax.dot_general(
        outc,
        eye,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.DEFAULT
            if outc.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        ),
    ).astype(out_ref.dtype)
    out_ref[0, :, 0, :, :] = outT.reshape(Dc, W, Cout)


def _auto_interpret(interpret):
    if interpret is not None:
        return bool(interpret)
    default_dev = jax.config.jax_default_device
    platform = (
        default_dev.platform if default_dev is not None else jax.default_backend()
    )
    return platform != "tpu"


def _call_sweep(
    ref_feat, src_feats, coeffs, valid, lo, nseg, depths_r, Dp,
    out_dtype, dc, band, interpret, norm=None, agg="variance", groups=8,
):
    """Shared pallas_call plumbing for both hypothesis parameterizations."""
    B, H, W, C = ref_feat.shape
    V, Hs, Ws = src_feats.shape[1], src_feats.shape[2], src_feats.shape[3]
    dense = depths_r is not None
    if norm is None:
        norm = (Ws / (Ws - 1.0), Hs / (Hs - 1.0), 0.0)
    Cout = C if agg == "variance" else groups

    samp_dtype = jnp.bfloat16 if src_feats.dtype == jnp.bfloat16 else jnp.float32
    precision = (
        jax.lax.Precision.DEFAULT
        if samp_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    # (B, V, Hs+3*BAND, C, Ws): zero row padding so every band slice stays
    # in range — the LAST segment can start up to hi+BAND (hi <= Hs+1), so
    # the bottom needs 2*BAND spare rows; an out-of-range dynamic slice
    # would read uninitialized VMEM. C-major so a band slice reshapes to
    # the (BAND*C, Ws) matmul operand for free.
    src_p = jnp.pad(src_feats, ((0, 0), (0, 0), (band, 2 * band), (0, 0), (0, 0)))
    src_p = jnp.transpose(src_p, (0, 1, 2, 4, 3))
    refT = jnp.transpose(ref_feat, (0, 1, 3, 2))  # (B, H, C, W)

    kernel = functools.partial(
        _sweep_kernel,
        Dc=dc, W=W, Ws=Ws, Hs=Hs, BAND=band, C=C, V=V,
        samp_dtype=samp_dtype, precision=precision, dense=dense,
        norm=norm, agg=agg, G=groups,
    )
    in_specs = [
        pl.BlockSpec(
            (1, V, Hs + 3 * band, C, Ws), lambda b, dk, r: (b, 0, 0, 0, 0)
        ),
        pl.BlockSpec((1, 1, C, W), lambda b, dk, r: (b, r, 0, 0)),
        (
            pl.BlockSpec(
                (1, V, 18), lambda b, dk, r: (b, 0, 0), memory_space=pltpu.SMEM
            )
            if dense
            else pl.BlockSpec((1, 1, V * 9, dc), lambda b, dk, r: (b, dk, 0, 0))
        ),
        # full (B, V) block: a (1, V) block would violate the trailing-dims
        # rule for B > 1; the kernel indexes rows by program_id(0)
        pl.BlockSpec(
            valid.shape, lambda b, dk, r: (0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (1, 1, H, V), lambda b, dk, r: (b, dk, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, 1, H, V), lambda b, dk, r: (b, dk, 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    args = [src_p, refT, coeffs, valid, lo, nseg]
    if dense:
        nblk = Dp // dc
        in_specs.append(
            pl.BlockSpec((1, 1, nblk, dc * W), lambda b, dk, r: (b, r, 0, 0))
        )
        args.append(depths_r)
    out = pl.pallas_call(
        kernel,
        grid=(B, Dp // dc, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, dc, 1, W, Cout), lambda b, dk, r: (b, dk, r, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, Dp, H, W, Cout), out_dtype),
        # the VMEM-resident source maps exceed Mosaic's default 16 MB
        # scoped budget at full-resolution f32 shapes (cvp level 0:
        # 2 views x 268 x 16 x 320 f32 = 11 MB); v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=bool(interpret),
    )(*args)
    return out


def warp_variance(
    ref_feat,
    src_feats,
    src_projs,
    ref_proj_inv,
    depth_values,
    src_valid=None,
    out_dtype=jnp.float32,
    dc=16,
    band=8,
    interpret=None,
    mats=None,
):
    """Fused plane-sweep warp + variance cost volume.

    Equivalent to warping every source view with ``ops.homography.
    homo_warp`` and aggregating E[x^2]-E[x]^2 over {ref, sources}
    (reference: rmvd/models/blocks/utils.py:222-268 + rmvd/models/
    mvsnet.py:124-137), masked views excluded.

    Args:
        ref_feat: (B, H, W, C) reference features.
        src_feats: (B, V, Hs, Ws, C) source features.
        src_projs: (B, V, 4, 4); ref_proj_inv: (B, 4, 4). Ignored when
            ``mats`` is given.
        depth_values: (B, D) depth hypotheses.
        src_valid: (B, V) 0/1 mask for padded view slots (None = all on).
        out_dtype: output dtype of the variance volume.
        dc: depth-block size (D is padded to a multiple).
        band: source-row band segment height.
        mats: optional precomputed (B, V, D, 3, 3) per-depth warp
            matrices (e.g. from R,t directly — see ``warp_variance_rt``).

    Returns:
        (B, D, H, W, C) variance volume in ``out_dtype``.
    """
    B, H, W, C = ref_feat.shape
    V, Hs = src_feats.shape[1], src_feats.shape[2]
    D = depth_values.shape[1]
    interpret = _auto_interpret(interpret)

    Dp = -(-D // dc) * dc
    if Dp != D:
        # pad with the last hypothesis; extra planes are sliced off below
        depth_values = jnp.concatenate(
            [depth_values, jnp.broadcast_to(depth_values[:, -1:], (B, Dp - D))],
            axis=1,
        )

    if mats is None:
        mats = plane_sweep_matrices(src_projs, ref_proj_inv, depth_values)
    elif mats.shape[2] != Dp:
        mats = jnp.concatenate(
            [mats, jnp.broadcast_to(mats[:, :, -1:], (B, V, Dp - D, 3, 3))],
            axis=2,
        )
    coeffs = mats.reshape(B, V, Dp, 9)  # row-major M00..M22
    coeffs = jnp.moveaxis(coeffs, 3, 2).reshape(B, V * 9, Dp // dc, dc)
    coeffs = jnp.moveaxis(coeffs, 2, 1)  # (B, nblk, V*9, dc)
    lo, nseg = _band_bounds(mats, H, W, Hs, dc, band)

    if src_valid is None:
        valid = jnp.ones((B, V), jnp.float32)
    else:
        valid = src_valid.astype(jnp.float32)

    out = _call_sweep(
        ref_feat, src_feats, coeffs, valid, lo, nseg, None, Dp,
        out_dtype, dc, band, interpret,
    )
    return out[:, :D]


def warp_variance_rt(
    ref_feat, src_feats, rot, trans, depth_values, **kwargs
):
    """Variance volume from per-view R,t (``rt_planesweep_warp``'s
    convention, reference: cvp_mvsnet_components.py:192-246) with scalar
    per-depth hypotheses.

    rot: (B, V, 3, 3); trans: (B, V, 3); depth_values: (B, D).
    """
    B, V = rot.shape[:2]
    e3 = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    Tmat = trans.astype(jnp.float32)[..., :, None] * e3[None, None, None, :]
    d = depth_values.astype(jnp.float32)[:, None, :, None, None]
    mats = rot.astype(jnp.float32)[:, :, None] * d + Tmat[:, :, None]
    return warp_variance(
        ref_feat, src_feats, None, None, depth_values, mats=mats, **kwargs
    )


def warp_variance_dense(
    ref_feat,
    src_feats,
    rot,
    trans,
    depth_hypos,
    src_valid=None,
    out_dtype=jnp.float32,
    dc=None,
    band=8,
    interpret=None,
):
    """Fused warp + variance with PER-PIXEL depth hypotheses.

    Equivalent to ``rt_planesweep_warp`` per view + E[x^2]-E[x]^2
    aggregation (reference: cvp_mvsnet_components.py:375-456
    ``proj_cost``), masked views excluded.

    Args:
        ref_feat: (B, H, W, C); src_feats: (B, V, Hs, Ws, C).
        rot: (B, V, 3, 3); trans: (B, V, 3) — src-from-ref transforms.
        depth_hypos: (B, D, H, W) per-pixel hypotheses.
        dc: depth-block size (default: all of D — D is small here).

    Returns:
        (B, D, H, W, C) variance volume in ``out_dtype``.
    """
    B, H, W, C = ref_feat.shape
    V, Hs = src_feats.shape[1], src_feats.shape[2]
    D = depth_hypos.shape[1]
    interpret = _auto_interpret(interpret)
    if dc is None:
        dc = D

    Dp = -(-D // dc) * dc
    if Dp != D:
        depth_hypos = jnp.concatenate(
            [
                depth_hypos,
                jnp.broadcast_to(depth_hypos[:, -1:], (B, Dp - D, H, W)),
            ],
            axis=1,
        )

    # affine coefficient form M = A + B*w with w = depth:
    # A = T in the last column, B = R
    e3 = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    Amat = trans.astype(jnp.float32)[..., :, None] * e3[None, None, None, :]
    rt = jnp.concatenate(
        [
            Amat.reshape(B, V, 9),
            rot.astype(jnp.float32).reshape(B, V, 9),
        ],
        axis=2,
    )  # (B, V, 18)
    lo, nseg = _band_bounds_affine(
        Amat, rot.astype(jnp.float32), depth_hypos, Hs, dc, band,
        sy=Hs / (Hs - 1.0), eps_z=0.0,
    )

    # (B, H, nblk, Dc*W): one contiguous lane vector per (row, depth-block)
    depths_r = jnp.transpose(depth_hypos.astype(jnp.float32), (0, 2, 1, 3))
    depths_r = depths_r.reshape(B, H, Dp // dc, dc * W)

    if src_valid is None:
        valid = jnp.ones((B, V), jnp.float32)
    else:
        valid = src_valid.astype(jnp.float32)

    out = _call_sweep(
        ref_feat, src_feats, rt, valid, lo, nseg, depths_r, Dp,
        out_dtype, dc, band, interpret,
    )
    return out[:, :D]


def _band_bounds_affine(Amat, Bmat, w_dense, Hs, dc, band, sy, eps_z):
    """Band bounds for the affine form M = A + B*w with dense per-pixel
    multipliers w: (B, D//dc, H, V) int32."""
    B, V = Amat.shape[:2]
    Dp, H, W = w_dense.shape[1:]
    xs = jnp.arange(W, dtype=jnp.float32)
    rs = jnp.arange(H, dtype=jnp.float32)
    w = w_dense.astype(jnp.float32)[:, None]  # (B,1,Dp,H,W)

    def row(i):
        # (A_ij + B_ij*w) applied to [x, r, 1]
        def m(j):
            return (
                Amat[:, :, None, None, None, i, j]
                + Bmat[:, :, None, None, None, i, j] * w
            )

        return (
            m(0) * xs[None, None, None, None, :]
            + m(1) * rs[None, None, None, :, None]
            + m(2)
        )

    yi = row(1) / (row(2) + eps_z) * sy - 0.5
    yi = jnp.where(jnp.isfinite(yi), yi, jnp.float32(1e9))
    yc = jnp.clip(yi, -1.0, jnp.float32(Hs))
    lo_d = jnp.floor(jnp.min(yc, axis=-1))  # (B,V,Dp,H)
    hi_d = jnp.floor(jnp.max(yc, axis=-1)) + 1.0
    lo_b = jnp.min(lo_d.reshape(B, V, Dp // dc, dc, H), axis=3)
    hi_b = jnp.max(hi_d.reshape(B, V, Dp // dc, dc, H), axis=3)
    lo = lo_b.astype(jnp.int32)
    nseg = (hi_b.astype(jnp.int32) - lo + band) // band
    return (
        jnp.transpose(lo, (0, 2, 3, 1)),
        jnp.transpose(nseg, (0, 2, 3, 1)),
    )


def homography_group_cost(
    ref_feat,
    src_feat,
    Amat,
    Bmat,
    w_dense,
    groups=8,
    out_dtype=jnp.float32,
    dc=None,
    band=8,
    interpret=None,
):
    """Fused per-pair homography warp + group-wise correlation.

    Equivalent to ``homography_warping`` of the source by per-(depth,
    pixel) homographies H = A + B*w followed by ``groupwise_correlation``
    against the reference volume (reference: blocks/utils.py:154-186 +
    71-88; Vis-MVSNet's per-pair cost volume, vis_mvsnet.py SingleStage).
    The homography grid offset (+0.5 pixel centers) must already be
    folded into A and B (M' = M @ [[1,0,.5],[0,1,.5],[0,0,1]]).

    Args:
        ref_feat: (B, H, W, C); src_feat: (B, Hs, Ws, C).
        Amat / Bmat: (B, 3, 3) affine homography coefficients.
        w_dense: (B, D, H, W) per-pixel multiplier (1/(depth+1e-9) for
            Vis-MVSNet's fronto-parallel homographies).
        groups: G — output channels (C % G == 0).

    Returns:
        (B, D, H, W, G) cost volume in ``out_dtype``.
    """
    B, H, W, C = ref_feat.shape
    Hs = src_feat.shape[1]
    D = w_dense.shape[1]
    interpret = _auto_interpret(interpret)
    if dc is None:
        dc = D if D <= 32 else 16

    Dp = -(-D // dc) * dc
    if Dp != D:
        w_dense = jnp.concatenate(
            [w_dense, jnp.broadcast_to(w_dense[:, -1:], (B, Dp - D, H, W))],
            axis=1,
        )

    A5 = Amat.astype(jnp.float32)[:, None]  # (B, 1, 3, 3)
    B5 = Bmat.astype(jnp.float32)[:, None]
    rt = jnp.concatenate(
        [A5.reshape(B, 1, 9), B5.reshape(B, 1, 9)], axis=2
    )  # (B, 1, 18)
    lo, nseg = _band_bounds_affine(
        A5, B5, w_dense, Hs, dc, band, sy=1.0, eps_z=1e-9
    )

    depths_r = jnp.transpose(w_dense.astype(jnp.float32), (0, 2, 1, 3))
    depths_r = depths_r.reshape(B, H, Dp // dc, dc * W)

    out = _call_sweep(
        ref_feat,
        src_feat[:, None],
        rt,
        jnp.ones((B, 1), jnp.float32),
        lo,
        nseg,
        depths_r,
        Dp,
        out_dtype,
        dc,
        band,
        interpret,
        norm=(1.0, 1.0, 1e-9),
        agg="group",
        groups=groups,
    )
    return out[:, :D]
