"""Plane-sweep warp volume as an MXU one-hot matmul Pallas kernel.

The XLA lowering of ``homo_warp`` (ops/homography.py) is gather-bound on
TPU: the paired-tap row gather issues one descriptor per output pixel and
measures ~3-4 cycles/descriptor — ~9 ms per (256,64,80,32) warped volume
on v5e where the output write alone is worth ~0.2 ms. This kernel removes
the gather entirely:

- a *quad-tap* buffer built once in XLA holds, at row ``t`` and column
  ``k``, the four bilinear taps ``(src[t-1,k-1], src[t-1,k], src[t,k-1],
  src[t,k])`` with zeros outside the image — so zeros padding is automatic
  and the whole buffer ((H+1)*(W+1), 4C) still fits VMEM for
  MVSNet-family shapes;
- each program instance covers one depth plane x a block of output rows,
  computes the projective sampling coordinates on the VPU, and contracts a
  0/1 one-hot selection matrix (exactly representable in bfloat16 — no
  precision loss in the matmul) against the quad buffer on the MXU,
  looping only over the *actually needed* buffer rows (dynamic fori
  bounds, typically block_rows+2 rows);
- the four returned taps are combined with float32 bilinear weights on the
  VPU, matching the XLA path bit-for-bit up to fp32 reassociation.

Reference semantics: rmvd/models/blocks/utils.py:222-268 (homo_warp) —
zeros padding, no z-masking (points behind the camera flip sign exactly as
the grid_sample path does). Parity is pinned against the XLA
``homo_warp`` in tests/test_warp_volume_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(rot_ref, trans_ref, depth_ref, quad_ref, out_ref, *, H, W, C, P,
                 DBLK):
    """One program = one (batch, depth-plane block, row-block).

    rot_ref:   (1, P, 3) fp32 — R @ [x, y, 1] per output pixel of the block
    trans_ref: (B, 3) fp32 in SMEM
    depth_ref: (B, D) fp32 in SMEM
    quad_ref:  (1, (H+1)*Wq, 4C) quad-tap source buffer (bf16)
    out_ref:   (1, DBLK, P, C) fp32
    """
    b = pl.program_id(0)
    di = pl.program_id(1)
    rx = rot_ref[0, :, 0].reshape(P, 1)
    ry = rot_ref[0, :, 1].reshape(P, 1)
    rz = rot_ref[0, :, 2].reshape(P, 1)

    for pi in range(DBLK):
        _warp_one_plane(
            rx, ry, rz, trans_ref, depth_ref, quad_ref, out_ref,
            b=b, di=di * DBLK + pi, pi=pi, H=H, W=W, C=C, P=P,
        )


def _warp_one_plane(rx, ry, rz, trans_ref, depth_ref, quad_ref, out_ref, *,
                    b, di, pi, H, W, C, P):
    d = depth_ref[b, di]
    px = rx * d + trans_ref[b, 0]
    py = ry * d + trans_ref[b, 1]
    pz = rz * d + trans_ref[b, 2]

    x = px / pz
    y = py / pz

    # reference normalization (ops/homography.py:59-62):
    # index = x * (W/(W-1)) - 0.5
    xf = x * (W / (W - 1.0)) - 0.5
    yf = y * (H / (H - 1.0)) - 0.5

    # sanitize non-finite / huge coordinates so int casts are defined and
    # the one-hot selection is exactly empty for them
    bad = jnp.logical_not(jnp.isfinite(xf) & jnp.isfinite(yf))
    xf = jnp.clip(jnp.where(bad, -3.0, xf), -1e6, 1e6)
    yf = jnp.clip(jnp.where(bad, -5.0, yf), -1e6, 1e6)

    x0f = jnp.floor(xf)
    y0f = jnp.floor(yf)
    wx = xf - x0f  # (P, 1) fp32
    wy = yf - y0f
    # quad-buffer coordinates: row t = y0+1 in [0, H], col k = x0+1 in [0, W]
    t = y0f.astype(jnp.int32) + 1
    k = x0f.astype(jnp.int32) + 1

    # quad row stride padded to a multiple of 8 so the dynamic VMEM row
    # slice (base * Wq) is provably sublane-aligned for Mosaic
    Wq = (W + 1 + 7) // 8 * 8
    CH = min(8, H + 1)

    # dynamic row-span of this block's taps; processed in CH-row chunks
    # (typically one chunk: a block_rows-tall output block maps to
    # ~block_rows+2 buffer rows for MVS-rig homographies)
    r_lo = jnp.maximum(0, jnp.min(t))
    r_hi = jnp.minimum(H, jnp.max(t))
    n_chunks = jnp.maximum(0, (r_hi - r_lo + CH) // CH)

    qf = jax.lax.broadcasted_iota(jnp.int32, (P, CH * Wq), dimension=1).astype(
        jnp.float32
    )

    def body(c, acc):
        start = r_lo + c * CH
        base = jnp.minimum(start, H + 1 - CH)  # keep the row slice in range
        # 0/1 one-hot over the flat chunk lanes: lane q addresses buffer
        # row base + q//Wq, column q%Wq; this pixel's single tap is at
        # key = (t-base)*Wq + k. For integer-valued floats the tent
        # max(0, 1-|q-key|) is an exact one-hot — no int compares (which
        # trip a Mosaic i1 relayout bug), no row/col decomposition.
        # Pixels whose tap row was already covered by an earlier chunk
        # (base clamped at the bottom edge) get an out-of-range key.
        key = ((t - base) * Wq + k).astype(jnp.float32)
        key = jnp.where(t < start, -10.0, key)  # (P, 1)
        # x-taps outside [0, W] would alias into a neighboring buffer row
        # (the flat key folds k modulo the row stride) — disable them
        key = jnp.where(k < 0, -10.0, key)
        key = jnp.where(k > W, -10.0, key)
        lhs = jnp.maximum(0.0, 1.0 - jnp.abs(qf - key)).astype(jnp.bfloat16)
        rows = quad_ref[0, pl.ds(base * Wq, CH * Wq), :]
        return acc + jnp.dot(lhs, rows, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((P, 4 * C), jnp.float32)
    )

    # fp32 bilinear combine of the four taps (tap order in the quad
    # buffer: (y0,x0), (y0,x1), (y1,x0), (y1,x1))
    out_ref[0, pi] = (
        acc[:, 0 * C : 1 * C] * ((1.0 - wx) * (1.0 - wy))
        + acc[:, 1 * C : 2 * C] * (wx * (1.0 - wy))
        + acc[:, 2 * C : 3 * C] * ((1.0 - wx) * wy)
        + acc[:, 3 * C : 4 * C] * (wx * wy)
    )


def _build_quad(src):
    """(B, H, W, C) -> (B, (H+1)*(W+1), 4C) quad-tap buffer.

    quad[t, k] = (src[t-1,k-1], src[t-1,k], src[t,k-1], src[t,k]) with
    zeros outside the image — bilinear zeros padding made structural.
    """
    B, H, W, C = src.shape
    zc = jnp.zeros((B, H, 1, C), src.dtype)
    pairs = jnp.concatenate(
        [jnp.concatenate([zc, src], axis=2), jnp.concatenate([src, zc], axis=2)],
        axis=-1,
    )  # (B, H, W+1, 2C): row y, col k -> (src[y,k-1], src[y,k])
    zr = jnp.zeros((B, 1, W + 1, 2 * C), src.dtype)
    quad = jnp.concatenate(
        [
            jnp.concatenate([zr, pairs], axis=1),  # row t -> pairs[t-1]
            jnp.concatenate([pairs, zr], axis=1),  # row t -> pairs[t]
        ],
        axis=-1,
    )  # (B, H+1, W+1, 4C)
    # pad the row stride to a multiple of 8 (Mosaic sublane alignment for
    # the kernel's dynamic row slice); padded columns never match a one-hot
    Wq = (W + 1 + 7) // 8 * 8
    quad = jnp.pad(quad, ((0, 0), (0, 0), (0, Wq - (W + 1)), (0, 0)))
    return quad.reshape(B, (H + 1) * Wq, 4 * C)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _homo_warp_pallas(src_feat, src_proj, ref_proj_inv, depth_values,
                      block_rows, interpret):
    B, H, W, C = src_feat.shape
    D = depth_values.shape[1]

    transform = (src_proj @ ref_proj_inv).astype(jnp.float32)
    R = transform[:, :3, :3]
    T = transform[:, :3, 3]  # (B, 3)

    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1).reshape(-1, 3)
    rot = jnp.einsum("bij,pj->bpi", R, grid)  # (B, H*W, 3) fp32

    quad = _build_quad(src_feat.astype(jnp.bfloat16))

    bi = block_rows
    while H % bi:
        bi //= 2
    P = bi * W
    n_blocks = H // bi
    DBLK = 4
    while D % DBLK:
        DBLK //= 2

    out = pl.pallas_call(
        functools.partial(_warp_kernel, H=H, W=W, C=C, P=P, DBLK=DBLK),
        grid=(B, D // DBLK, n_blocks),
        in_specs=[
            pl.BlockSpec((1, P, 3), lambda b, d, i: (b, i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, (H + 1) * ((W + 1 + 7) // 8 * 8), 4 * C),
                lambda b, d, i: (b, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, DBLK, P, C), lambda b, d, i: (b, d, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, H * W, C), jnp.float32),
        interpret=bool(interpret),
    )(rot, T, depth_values.astype(jnp.float32), quad)
    return out.reshape(B, D, H, W, C)


def homo_warp_pallas(src_feat, src_proj, ref_proj_inv, depth_values,
                     block_rows=8, interpret=None):
    """Drop-in for ops.homography.homo_warp, fp32 output.

    Forward-only Pallas kernel with a custom VJP that differentiates the
    XLA path (the MVSNet-family models that use it are eval-only; training
    through it stays correct via the fallback). The source features are
    consumed in bfloat16 (the mixed-precision family path); use the XLA
    path where full fp32 feature precision is required.
    """
    if interpret is None:
        # Mosaic kernels need a TPU; everywhere else (incl. the tests'
        # jax_default_device=cpu routing) run interpreted
        default_dev = jax.config.jax_default_device
        platform = (
            default_dev.platform if default_dev is not None else jax.default_backend()
        )
        interpret = platform != "tpu"
    return _homo_warp_vjp(src_feat, src_proj, ref_proj_inv, depth_values,
                          block_rows, bool(interpret))


# The bwd rule differentiates the fp32 XLA path while the fwd runs the bf16
# Pallas kernel; that inconsistency is fine for finite-difference testing but
# must not silently leak into a training path (advisor round-4, low).
ALLOW_TRAIN = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _homo_warp_vjp(src_feat, src_proj, ref_proj_inv, depth_values,
                   block_rows, interpret):
    return _homo_warp_pallas(src_feat, src_proj, ref_proj_inv, depth_values,
                             block_rows, interpret)


def _homo_warp_fwd(src_feat, src_proj, ref_proj_inv, depth_values,
                   block_rows, interpret):
    out = _homo_warp_pallas(src_feat, src_proj, ref_proj_inv, depth_values,
                            block_rows, interpret)
    return out, (src_feat, src_proj, ref_proj_inv, depth_values)


def _homo_warp_bwd(block_rows, interpret, res, g):
    from ..homography import homo_warp

    if not ALLOW_TRAIN:
        raise NotImplementedError(
            "homo_warp_pallas backward: the VJP differentiates the fp32 XLA "
            "homo_warp while the forward ran the bf16 Pallas kernel, so "
            "gradients would not match the computed forward. Use "
            "ops.homography.homo_warp for training, or set "
            "robustmvd_tpu.ops.pallas.warp_volume.ALLOW_TRAIN = True to "
            "accept the mismatch explicitly."
        )
    src_feat, src_proj, ref_proj_inv, depth_values = res

    def f(src_feat, src_proj, ref_proj_inv, depth_values):
        return homo_warp(src_feat, src_proj, ref_proj_inv, depth_values).astype(
            jnp.float32
        )

    _, vjp = jax.vjp(f, src_feat, src_proj, ref_proj_inv, depth_values)
    return vjp(g)


_homo_warp_vjp.defvjp(_homo_warp_fwd, _homo_warp_bwd)
