"""Plane-sweep correlation — the framework's flagship compute op.

Semantics (identical to the reference's `PlanesweepCorrelation` +
`TorchCorr`, rmvd/models/blocks/planesweep_corr.py:143-195,371-521):
for every key pixel p and inverse-depth hypothesis s, correlate the key
feature vector with the source feature map bilinearly sampled at the
epipolar point (us[s,p], vs[s,p]); zero out samples that fall outside the
source image or behind either camera.

TPU-native formulations, selected by ``impl``:

- ``"pixelscan"`` (default, fastest measured): a lax.scan over pixel
  chunks computes each chunk's all-pairs scores on the MXU and contracts
  them with bilinear tent weights immediately — the (P, Hs·Ws) score
  matrix never reaches HBM (no layout copy, no re-reads; 1.6x the
  hypothesis-slab path on v5e, and the backward recomputes per chunk).
  Coordinates, visibility and the in-bounds mask are generated inside the
  scan from the epipolar coefficients, so no (B, S, H, W) intermediate
  exists at all. See ``_corr_pixelscan_fused``.

- ``"matmul"``: compute the all-pairs score matrix
  ``ref^T @ src / sqrt(C)`` on the MXU (one large bf16-friendly matmul),
  then bilinearly gather *scalars* along each key pixel's row at the S
  hypothesis locations. Gathered bytes shrink by a factor of C (=256)
  versus warping features, which makes this strongly compute-bound — the
  right trade on TPU where MXU FLOPs are cheap and HBM bandwidth is the
  bottleneck. (The reference does the same matmul but routes the gather
  through `grid_sample`, planesweep_corr.py:174-195.)

- ``"gather"``: warp the source features to each hypothesis (4 row-gathers
  of C-vectors + lerp) and dot with the key features. Bandwidth-heavy but
  a useful oracle and better when S is small or C is tiny.

All impls produce equivalent math (bilinear interpolation commutes with
the dot product); tests check them against each other, against a brute-
force numpy oracle, and against the reference torch implementation.

Layout: features are NHWC; the returned correlation volume is (B, H, W, S)
(hypotheses as trailing channels) so downstream convs consume it directly.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# ablation-only switch (tools/bench_division_ablation.py): replaces the
# reference-exact coordinate divisions in the pixel-chunk scan with
# reciprocal-multiply. Read at trace time; never enable in production —
# it can flip boundary mask bits (see comment at the divide site).
_RECIP_ABLATION = os.environ.get("RMVD_TPU_CORR_RECIP", "0") == "1"

from .epipolar import EpipolarCoeffs, make_epipolar_coeffs, planesweep_points, sampling_invdepths
from .sampling import bilinear_sample


def _corr_matmul(feat_key, feat_src, us, vs, vis_mask, precision=None, use_pallas=False, sampling_dtype="float32", slab_size=128):
    """All-pairs matmul + scalar bilinear gather along rows.

    feat_key: (B, H, W, C); feat_src: (B, Hs, Ws, C);
    us, vs, vis_mask: (B, S, H, W) in pixel-center coords.
    Returns corr, mask: (B, H, W, S).
    """
    B, H, W, C = feat_key.shape
    Hs, Ws = feat_src.shape[1], feat_src.shape[2]
    S = us.shape[1]

    scale = 1.0 / jnp.sqrt(jnp.asarray(C, dtype=jnp.float32))

    if precision is None:
        # fp32 features: full fp32 on the MXU (3/6-pass); the TPU default
        # would use bf16 passes, costing ~0.5% relative error on scores.
        # bf16 features (mixed-precision model): native single-pass MXU.
        precision = (
            jax.lax.Precision.DEFAULT
            if feat_key.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        )

    ref = feat_key.reshape(B, H * W, C)
    src = feat_src.reshape(B, Hs * Ws, C)
    # (B, HW, HsWs) — the MXU-bound bulk of the op.
    corr_full = jax.lax.dot_general(
        ref,
        src,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) * scale

    # pixel-center -> index space
    x = jnp.transpose(us, (0, 2, 3, 1)).reshape(B, H * W, S) - 0.5
    y = jnp.transpose(vs, (0, 2, 3, 1)).reshape(B, H * W, S) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # --- gather-free bilinear sampling via separable interpolation matmuls.
    #
    # The four bilinear taps share their x-coordinates across the two rows,
    # so the sample factorizes per (pixel, hypothesis):
    #     value = ry . (corr_image @ rx)
    # with ry (Hs,) and rx (Ws,) each holding two interpolation weights.
    # Built as dense one-hot-weighted vectors from iota comparisons, the
    # y-contraction becomes a batched (S, Hs) x (Hs, Ws) MXU matmul per
    # pixel and the x-contraction a fused elementwise reduce — ZERO gather
    # ops. TPU gathers cost ~40-80 ns per index (tens of ms per view at
    # 256 hypotheses); this formulation is pure MXU/VPU + HBM streaming.
    # Out-of-range taps match no iota position and contribute exactly 0,
    # reproducing zeros-padding semantics. A scan over hypothesis slabs
    # bounds the (P, slab, Ws) intermediate.
    corr_img = corr_full.reshape(B, H * W, Hs, Ws)
    P = H * W
    dtype32 = jnp.float32

    if use_pallas:
        from .pallas.planesweep_sample import planesweep_sample

        out = jax.vmap(
            lambda ci, yy, wyy, xx, wxx: planesweep_sample(ci, yy, wyy, xx, wxx)
        )(corr_img, y0i, wy, x0i, wx)
        return _finish_corr(out, feat_key, vis_mask, x0i, y0i, wx, wy, B, H, W, S, Hs, Ws)

    # slab_size=128 fills the MXU's M dimension in the per-slab dot
    # (round-1 measurements on v5e at KITTI eval shape: slab 64 -> 18.3
    # ms/frame full forward, 128 -> 10.3 ms, 256 -> 10.7; current headline
    # numbers live in PARITY.md / BENCH_r*.json). This impl is kept as an
    # oracle/ablation path; "pixelscan" supersedes it as the default.
    slab = S
    for cand in (slab_size, 128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= S and S % cand == 0:
            slab = cand
            break
    num_slabs = S // slab

    y_iota = jnp.arange(Hs, dtype=jnp.int32)  # (Hs,)
    x_iota = jnp.arange(Ws, dtype=jnp.int32)  # (Ws,)

    def to_slabs(a):
        # (B, P, S) -> (num_slabs, B, P, slab)
        return jnp.moveaxis(a.reshape(B, P, num_slabs, slab), 2, 0)

    y0_s, wy_s = to_slabs(y0i), to_slabs(wy)
    x0_s, wx_s = to_slabs(x0i), to_slabs(wx)

    # bf16 interpolation storage halves the HBM traffic of the two-hot
    # weights and partial products (the sampling stage is bandwidth-bound);
    # the MXU still accumulates in fp32. bf16 sampling costs ~1e-3 relative
    # score error; fp32 sampling (the default for fp32 features) is exact.
    # bf16 features (mixed-precision model) imply bf16 sampling storage.
    samp_dtype = (
        jnp.bfloat16
        if (sampling_dtype == "bfloat16" or feat_key.dtype == jnp.bfloat16)
        else jnp.float32
    )
    corr_in = corr_img.astype(samp_dtype)
    # bf16 sampling operands want the native single-pass MXU dot; carrying
    # a HIGHEST precision config (fp32-features path) onto a bf16 dot would
    # defeat the bandwidth/IR intent without improving accuracy.
    samp_precision = (
        jax.lax.Precision.DEFAULT if samp_dtype == jnp.bfloat16 else precision
    )

    # remat the slab body: without it, autodiff stacks the (B, P, slab, Ws)
    # partial products across all scan steps (x views under vmap) — gigabytes
    # of residuals for an intermediate that is trivial to recompute.
    @jax.checkpoint
    def slab_fn(_, slab_in):
        y0b, wyb, x0b, wxb = slab_in  # (B, P, slab)
        # ry: (B, P, slab, Hs) two-hot interpolation weights over rows
        ry = (
            jnp.where(y_iota == y0b[..., None], (1.0 - wyb)[..., None], 0.0)
            + jnp.where(y_iota == (y0b + 1)[..., None], wyb[..., None], 0.0)
        ).astype(samp_dtype)
        # y-contraction on the MXU: (B, P, slab, Hs) @ (B, P, Hs, Ws)
        m = jax.lax.dot_general(
            ry,
            corr_in,
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=samp_dtype,
            precision=samp_precision,
        )  # (B, P, slab, Ws)
        # x-contraction fused into the reduce (fp32 accumulation)
        rx = (
            jnp.where(x_iota == x0b[..., None], (1.0 - wxb)[..., None], 0.0)
            + jnp.where(x_iota == (x0b + 1)[..., None], wxb[..., None], 0.0)
        ).astype(samp_dtype)
        return None, jnp.sum(
            m.astype(dtype32) * rx.astype(dtype32), axis=-1
        )  # (B, P, slab)

    _, out = jax.lax.scan(slab_fn, None, (y0_s, wy_s, x0_s, wx_s))
    out = jnp.moveaxis(out, 0, 2).reshape(B, P, S)
    return _finish_corr(out, feat_key, vis_mask, x0i, y0i, wx, wy, B, H, W, S, Hs, Ws)


def _finish_corr(out, feat_key, vis_mask, x0i, y0i, wx, wy, B, H, W, S, Hs, Ws):
    """Apply the all-taps-in-bounds + visibility mask and reshape to

    (B, H, W, S) (shared by the XLA and Pallas sampling paths)."""

    def tap_valid(dy, dx):
        xi = x0i + dx
        yi = y0i + dy
        valid = (xi >= 0) & (xi <= Ws - 1) & (yi >= 0) & (yi <= Hs - 1)
        wxx = wx if dx == 1 else (1.0 - wx)
        wyy = wy if dy == 1 else (1.0 - wy)
        return wxx * wyy * valid

    wsum = tap_valid(0, 0) + tap_valid(0, 1) + tap_valid(1, 0) + tap_valid(1, 1)
    in_bounds = (wsum >= 0.9999).astype(feat_key.dtype)  # all taps valid
    vis = jnp.transpose(vis_mask, (0, 2, 3, 1)).reshape(B, H * W, S)
    mask = in_bounds * vis.astype(feat_key.dtype)
    corr = out.astype(feat_key.dtype) * mask

    corr = corr.reshape(B, H, W, S)
    mask = mask.reshape(B, H, W, S)
    return corr, mask


def _corr_pixelscan_fused(
    feat_key, feat_src, coeffs, invdepths, sampling_dtype="float32", chunk=1920
):
    """Fully-fused pixel-chunk scan: epipolar coordinates, visibility,
    in-bounds mask, all-pairs scores and bilinear sampling in ONE scan.

    Beyond _corr_matmul's separable-matmul sampling, this generates the
    sampling coordinates per chunk from the closed-form epipolar
    coefficients (rational-linear in inverse depth, ops/epipolar.py) and
    derives the all-taps-in-bounds mask from the tent-weight sums: sum_y(ry) * sum_x(rx) equals the old
    4-tap weight sum exactly (tents are zero out of range), so
    ``wsum >= 0.9999`` reproduces _finish_corr's mask bit-for-bit in f32.
    This removes every (B, S, H, W)-sized intermediate (us, vs, vis,
    x0/y0/wx/wy) from HBM — only the (B, H, W, S) outputs remain.

    Reference semantics: planesweep_corr.py:396-427 forward +
    :489-512 sampling points + :499-506 visibility.
    """
    B, H, W, C = feat_key.shape
    Hs, Ws = feat_src.shape[1], feat_src.shape[2]
    S = invdepths.shape[-1]
    P = H * W
    out_dtype = feat_key.dtype

    samp_dtype = (
        jnp.bfloat16
        if (sampling_dtype == "bfloat16" or feat_key.dtype == jnp.bfloat16)
        else jnp.float32
    )
    precision = (
        jax.lax.Precision.DEFAULT
        if feat_key.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    scale = np.float32(1.0) / np.sqrt(np.float32(C))

    # balance the chunk so padding stays minimal: a fixed chunk of 1920 at
    # e.g. P=4608 (training crops) would pad 25% dead pixels; instead keep
    # the step count and shrink the chunk to the smallest multiple of 8
    # that covers P in that many steps.
    n = max(1, -(-P // min(chunk, P)))
    chunk_eff = -(-(-(-P // n)) // 8) * 8
    Pp = n * chunk_eff
    ref = feat_key.reshape(B, P, C)
    uvk = coeffs.uvk_inf.reshape(B, P, 3)
    if Pp != P:
        ref = jnp.pad(ref, ((0, 0), (0, Pp - P), (0, 0)))
        # pad rows may produce arbitrary (even in-bounds) coordinates when
        # m_k != 0; correctness relies on the final [:, :P] slice dropping
        # their outputs and on the zeroed ref rows, NOT on their masks.
        uvk = jnp.pad(uvk, ((0, 0), (0, Pp - P), (0, 0)))

    iota_h = jnp.arange(Hs, dtype=jnp.float32)
    iota_w = jnp.arange(Ws, dtype=jnp.float32)

    def per_batch(ref_b, srcT_b, uvk_b, m_b, ds_b):
        # Gradients never flow through the sampling COORDINATES: they derive
        # from poses/intrinsics/hypotheses, none of which are learned (the
        # reference likewise discards grid_sample's grid gradient). Without
        # this, the scan's backward materializes d_ryT/d_rxT cotangents —
        # (chunk, Hs|Ws, S) f32 tensors, ~1.5 GB/step at the paper recipe.
        uvk_b = jax.lax.stop_gradient(uvk_b)
        m_b = jax.lax.stop_gradient(m_b)
        ds_b = jax.lax.stop_gradient(ds_b)
        refs = ref_b.reshape(n, chunk_eff, C)
        uvks = uvk_b.reshape(n, chunk_eff, 3)
        m_u, m_v, m_k = m_b[0], m_b[1], m_b[2]
        zs = 1.0 / ds_b  # (S,)
        vis_key = (zs > 0.0)[None, :]  # (1, S)

        @jax.checkpoint
        def step(_, inp):
            r, uvkc = inp  # (chunk, C), (chunk, 3)
            u_inf = uvkc[:, 0:1]  # (chunk, 1)
            v_inf = uvkc[:, 1:2]
            k_inf = uvkc[:, 2:3]
            denom = k_inf + m_k * ds_b[None, :]  # (chunk, S)
            # true division, matching the reference's per-coordinate divide
            # (planesweep_corr.py:333-349): a reciprocal-then-multiply can be
            # 1 ulp off, enough to flip floor() / the wsum>=0.9999 threshold
            # on exact pixel/image-boundary coordinates. Measured cost of
            # the divides vs reciprocal-multiply (isolated op, v5e, KITTI
            # shape, bf16): 15.18 vs 15.14 ms/view — a 0.2% delta below the
            # 0.3% division-vs-division rerun noise; the r01->r02
            # 134.7->131.3 fps drop did not reproduce in round 3 (134.4
            # with divisions) and was environment noise. The MXU dots
            # dominate. RMVD_TPU_CORR_RECIP=1 selects the reciprocal path
            # for ablation only (tools/bench_division_ablation.py).
            if _RECIP_ABLATION:
                recip = 1.0 / denom
                xx = (u_inf + m_u * ds_b[None, :]) * recip - 0.5
                yy = (v_inf + m_v * ds_b[None, :]) * recip - 0.5
            else:
                xx = (u_inf + m_u * ds_b[None, :]) / denom - 0.5
                yy = (v_inf + m_v * ds_b[None, :]) / denom - 0.5

            def fix(a):
                a = jnp.where(jnp.isinf(a), 1e9 * jnp.sign(a), a)
                return jnp.where(jnp.isnan(a), 1e9, a)

            xx = fix(xx)
            yy = fix(yy)

            # visibility: in front of both cameras (planesweep_corr.py:499-506)
            vis = vis_key & ((k_inf * zs[None, :] + m_k) > 0.0)  # (chunk, S)

            corr = jax.lax.dot_general(
                r,
                srcT_b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=samp_dtype,
                precision=precision,
            ).reshape(chunk_eff, Hs, Ws)
            # x-contraction on the MXU first: K=Ws (better MXU fill than
            # K=Hs — feature maps are wider than tall at every benchmark
            # size) and the remaining VPU reduce runs over Hs, the short
            # axis: (chunk, Hs, S) instead of (chunk, Ws, S).
            rxT = jnp.maximum(
                0.0, 1.0 - jnp.abs(iota_w[:, None] - xx[:, None, :])
            ).astype(samp_dtype)  # (chunk, Ws, S)
            m2 = jax.lax.dot_general(
                corr,
                rxT,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # (chunk, Hs, S)
            ryT = jnp.maximum(
                0.0, 1.0 - jnp.abs(iota_h[:, None] - yy[:, None, :])
            )  # (chunk, Hs, S) f32: multiplies into the f32 reduce
            sampled = jnp.sum(m2 * ryT, axis=1) * scale  # (chunk, S)

            # all-taps-in-bounds via the CLOSED FORM of the tent weight
            # sums: sum_y max(0, 1-|y-c|) over the integer grid [0, N-1]
            # equals clamp(min(c+1, N-1-c+1), 0, 1) — exactly 1 iff both
            # taps are in range, edge ramps otherwise. O(chunk*S) instead
            # of reducing the (chunk, N, S) tent tensors.
            def tent_sum(c, N):
                return jnp.clip(jnp.minimum(c + 1.0, jnp.float32(N) - c), 0.0, 1.0)

            wsum = tent_sum(yy, Hs) * tent_sum(xx, Ws)
            mask = ((wsum >= 0.9999) & vis).astype(out_dtype)
            return None, (sampled.astype(out_dtype) * mask, mask)

        _, (corr, mask) = jax.lax.scan(step, None, (refs, uvks))
        return corr.reshape(Pp, S), mask.reshape(Pp, S)

    srcT = jnp.transpose(feat_src.reshape(B, Hs * Ws, C), (0, 2, 1))
    corr, mask = jax.vmap(per_batch)(ref, srcT, uvk, coeffs.m, invdepths)
    corr = corr[:, :P].reshape(B, H, W, S)
    mask = mask[:, :P].reshape(B, H, W, S)
    return corr, mask


def _corr_gather(feat_key, feat_src, us, vs, vis_mask, slab_size=16):
    """Hypothesis-slab row-gather + fused dot — the fast TPU formulation.

    TPU gathers are efficient only when fetching contiguous *rows* (full
    lane vectors); gathering scalars along the minor axis serializes on the
    scalar unit (the matmul formulation's score gather costs ~300 ms per
    KITTI-sized view that way). Here each of the 4 bilinear taps is a row
    gather of C-wide feature vectors from the flattened source map — the
    embedding-lookup pattern the hardware likes — and the dot against the
    key features fuses into the gather consumer. A lax.scan over hypothesis
    slabs bounds the live intermediate to (B, slab*H*W, C), which also maps
    directly onto hypothesis-sharded meshes.
    """
    B, H, W, C = feat_key.shape
    Hs, Ws = feat_src.shape[1], feat_src.shape[2]
    S = us.shape[1]
    dtype = feat_key.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, dtype=jnp.float32))

    slab_size = min(slab_size, S)
    while S % slab_size != 0:
        slab_size -= 1
    num_slabs = S // slab_size

    src_flat = feat_src.reshape(B, Hs * Ws, C)
    ref = feat_key.reshape(B, 1, H * W, C)

    # (num_slabs, B, slab, H, W)
    def to_slabs(a):
        return jnp.moveaxis(
            a.reshape(B, num_slabs, slab_size, H, W), 1, 0
        )

    us_s = to_slabs(us)
    vs_s = to_slabs(vs)
    vis_s = to_slabs(vis_mask.astype(dtype))

    def slab_fn(_, slab):
        u, v, vis = slab  # (B, slab, H, W)
        x = u - 0.5
        y = v - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        corr = jnp.zeros((B, slab_size, H * W), jnp.float32)
        wsum = jnp.zeros((B, slab_size, H * W), dtype)

        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0i + dx
                yi = y0i + dy
                valid = (
                    (xi >= 0) & (xi <= Ws - 1) & (yi >= 0) & (yi <= Hs - 1)
                )
                idx = jnp.clip(yi, 0, Hs - 1) * Ws + jnp.clip(xi, 0, Ws - 1)
                idx = idx.reshape(B, slab_size * H * W)
                rows = jnp.take_along_axis(src_flat, idx[..., None], axis=1)
                rows = rows.reshape(B, slab_size, H * W, C)
                wxx = (wx if dx == 1 else 1.0 - wx).reshape(B, slab_size, H * W)
                wyy = (wy if dy == 1 else 1.0 - wy).reshape(B, slab_size, H * W)
                w = wxx * wyy * valid.reshape(B, slab_size, H * W).astype(dtype)
                corr = corr + w * jnp.sum(
                    rows * ref, axis=-1, dtype=jnp.float32
                )
                wsum = wsum + w

        in_bounds = (wsum >= 0.9999).astype(dtype)
        mask = in_bounds * vis.reshape(B, slab_size, H * W)
        corr = corr.astype(dtype) * scale * mask
        return None, (corr, mask)

    _, (corr, mask) = jax.lax.scan(slab_fn, None, (us_s, vs_s, vis_s))
    # (num_slabs, B, slab, HW) -> (B, H, W, S)
    corr = jnp.moveaxis(corr, 0, 1).reshape(B, S, H, W)
    mask = jnp.moveaxis(mask, 0, 1).reshape(B, S, H, W)
    corr = jnp.transpose(corr, (0, 2, 3, 1))
    mask = jnp.transpose(mask, (0, 2, 3, 1))
    return corr, mask


def planesweep_correlation_single(
    feat_key,
    feat_src,
    intrinsics_key,
    intrinsics_src,
    key_to_source_transform,
    invdepths,
    impl="matmul",
    slab_size=128,
):
    """Correlation volume for one source view.

    Args:
        feat_key: (B, H, W, C) key features.
        feat_src: (B, Hs, Ws, C) source features.
        intrinsics_key / intrinsics_src: (B, 3, 3) relative intrinsics.
        key_to_source_transform: (B, 4, 4).
        invdepths: (B, S) inverse-depth hypotheses.
        impl: "pixelscan" | "matmul" | "gather" (+ "_bf16" variants, "pallas").

    Returns:
        corr, mask: (B, H, W, S) float32.
    """
    B, H, W, _ = feat_key.shape
    Hs, Ws = feat_src.shape[1], feat_src.shape[2]

    coeffs = make_epipolar_coeffs(
        intrinsics_key,
        intrinsics_src,
        key_to_source_transform,
        height=H,
        width=W,
        height_source=Hs,
        width_source=Ws,
    )

    # the pixelscan impls generate coordinates + masks inside the scan from
    # the epipolar coefficients — no (B, S, H, W) intermediates at all
    if impl == "pixelscan":
        return _corr_pixelscan_fused(feat_key, feat_src, coeffs, invdepths)
    elif impl == "pixelscan_bf16":
        return _corr_pixelscan_fused(
            feat_key, feat_src, coeffs, invdepths, sampling_dtype="bfloat16"
        )

    us, vs, vis = planesweep_points(coeffs, invdepths)

    if impl == "matmul":
        return _corr_matmul(feat_key, feat_src, us, vs, vis, slab_size=slab_size)
    elif impl == "matmul_bf16":
        return _corr_matmul(
            feat_key, feat_src, us, vs, vis, sampling_dtype="bfloat16", slab_size=slab_size
        )
    elif impl == "pallas":
        return _corr_matmul(feat_key, feat_src, us, vs, vis, use_pallas=True)
    elif impl == "gather":
        return _corr_gather(feat_key, feat_src, us, vs, vis)
    else:
        raise ValueError(f"unknown impl: {impl}")


def planesweep_correlation(
    feat_key,
    feat_sources,
    intrinsics_key,
    intrinsics_sources,
    key_to_source_transforms,
    num_sampling_points=None,
    min_depth=None,
    max_depth=None,
    invdepths=None,
    sampling_type="linear_invdepth",
    impl="matmul",
    slab_size=128,
):
    """Correlation volumes over all source views.

    Args:
        feat_key: (B, H, W, C).
        feat_sources: (B, V, Hs, Ws, C) stacked source features.
        intrinsics_key: (B, 3, 3); intrinsics_sources: (B, V, 3, 3) or None
            (key intrinsics reused, reference: planesweep_corr.py:441-442).
        key_to_source_transforms: (B, V, 4, 4).
        num_sampling_points / min_depth / max_depth or explicit invdepths
            (B, S) — exactly one of the two parameterizations
            (reference: planesweep_corr.py:464-487).
        impl: "pixelscan" | "matmul" | "gather" (+ "_bf16" variants, "pallas").

    Returns:
        corrs: (B, V, H, W, S), masks: (B, V, H, W, S), invdepths: (B, S).
    """
    B = feat_key.shape[0]
    V = feat_sources.shape[1]

    if invdepths is None:
        assert min_depth is not None and max_depth is not None
        # hypothesis values and all downstream coordinate math stay fp32
        # regardless of the feature compute dtype: bf16's ~0.4% relative
        # error on us/vs would shift sampling positions by a fraction of a
        # pixel, which is a real accuracy loss (unlike bf16 feature scores).
        invdepths = sampling_invdepths(
            min_depth, max_depth, num_sampling_points, sampling_type, dtype=jnp.float32
        )
        invdepths = jnp.broadcast_to(invdepths, (B, invdepths.shape[-1]))

    if intrinsics_sources is None:
        intrinsics_sources = jnp.broadcast_to(
            intrinsics_key[:, None], (B, V, 3, 3)
        )

    # Rematerialize the per-view correlation under autodiff: the all-pairs
    # score matrix and the sampling intermediates are large (hundreds of MB
    # per view at training sizes) but cheap to recompute — without remat a
    # batch-4 train step at the paper's crop size exceeds a v5e's HBM.
    @jax.checkpoint
    def per_view(feat_src, K_src, T):
        return planesweep_correlation_single(
            feat_key, feat_src, intrinsics_key, K_src, T, invdepths, impl=impl,
            slab_size=slab_size,
        )

    corrs, masks = jax.vmap(per_view, in_axes=(1, 1, 1), out_axes=1)(
        feat_sources, intrinsics_sources, key_to_source_transforms
    )
    return corrs, masks, invdepths
