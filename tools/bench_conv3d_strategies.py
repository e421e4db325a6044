#!/usr/bin/env python3
"""Microbenchmark: 3D-conv strategies for the MVSNet-family regularizers.

The CostRegNet 3D convs have 8-64 channels; XLA pads the channel dim to
the 128-wide TPU lane dimension, so the default conv runs lane-bound at
<1% MFU (PARITY.md family note). This tool measures candidate
reformulations at the real CostRegNet shapes (B=1, D=256 volume for a
256x320 input) and checks each against the lax.conv oracle:

  xla      — lax.conv_general_dilated NDHWC (current model path)
  ncdhw    — same conv in NCDHW layout (transposes included in timing)
  im2col   — 27 shifted views concatenated on channels + one dot
             (K=27*Cin, N=Cout: N still lane-padded)
  packedT  — w-packed lanes: 27 pre-shifted packed views, block-diagonal
             (27, T*Cin, T*Cout) dot — all T*Cout output lanes useful
  bandedT  — overlapping (T+2)-wide w-windows, 9 (dz,dy) taps, banded
             (9, (T+2)*Cin, T*Cout) dot — K density 3/(T+2) vs 1/T

Each strategy is a (prepare, run) pair: prepare() turns the dense kernel
into the strategy's constant operands on the host; run is the jitted
compute. Timing covers run only (in the model the packed matrices are
formed once per call from the params — a trivial scatter vs the conv
itself).

Usage: python tools/bench_conv3d_strategies.py [--dtype bfloat16]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pack_block_diag(k, T):
    """(3,3,3,C,Co) -> (27, T*C, T*Co) block-diagonal tap matrices."""
    kh = np.asarray(k, np.float32)
    C, Co = kh.shape[3], kh.shape[4]
    M = np.zeros((27, T * C, T * Co), np.float32)
    for tap in range(27):
        dz, dy, dx = tap // 9, (tap // 3) % 3, tap % 3
        for t in range(T):
            M[tap, t * C : (t + 1) * C, t * Co : (t + 1) * Co] = kh[dz, dy, dx]
    return M


def pack_banded(k, T):
    """(3,3,3,C,Co) -> (9, (T+2)*C, T*Co) banded x-tap matrices."""
    kh = np.asarray(k, np.float32)
    C, Co = kh.shape[3], kh.shape[4]
    M = np.zeros((9, (T + 2) * C, T * Co), np.float32)
    for tap in range(9):
        dz, dy = tap // 3, tap % 3
        for t_out in range(T):
            for j in range(t_out, t_out + 3):
                M[tap, j * C : (j + 1) * C, t_out * Co : (t_out + 1) * Co] = (
                    kh[dz, dy, j - t_out]
                )
    return M


def make_strategies(jnp, lax):
    def conv_xla(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def conv_ncdhw(x, k):
        xt = jnp.transpose(x, (0, 4, 1, 2, 3))
        kt = jnp.transpose(k, (4, 3, 0, 1, 2))
        out = lax.conv_general_dilated(
            xt, kt, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )
        return jnp.transpose(out, (0, 2, 3, 4, 1))

    def conv_im2col(x, kf):
        B, D, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        views = [
            xp[:, dz : dz + D, dy : dy + H, dx : dx + W, :]
            for dz in range(3) for dy in range(3) for dx in range(3)
        ]
        patches = jnp.concatenate(views, axis=-1)  # (B,D,H,W,27*C)
        out = lax.dot_general(
            patches, kf, (((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype)

    def conv_packed(T):
        def f(x, M):
            B, D, H, W, C = x.shape
            Co = M.shape[-1] // T
            Wp = -(-W // T) * T
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1 + Wp - W), (0, 0)))
            Wt = Wp // T
            views = [
                xp[:, dz : dz + D, dy : dy + H, dx : dx + Wp, :].reshape(
                    B, D, H, Wt, T * C
                )
                for dz in range(3) for dy in range(3) for dx in range(3)
            ]
            lhs = jnp.stack(views, axis=-2)  # (B,D,H,Wt,27,T*C)
            out = lax.dot_general(
                lhs, M, (((4, 5), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.reshape(B, D, H, Wp, Co)[:, :, :, :W].astype(x.dtype)

        return f

    def conv_banded(T):
        def f(x, M):
            B, D, H, W, C = x.shape
            Co = M.shape[-1] // T
            Wp = -(-W // T) * T
            Wt = Wp // T
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1 + Wp - W), (0, 0)))
            wins = jnp.stack(
                [
                    xp[:, :, :, i * T : i * T + T + 2, :].reshape(
                        B, D + 2, H + 2, (T + 2) * C
                    )
                    for i in range(Wt)
                ],
                axis=-2,
            )  # (B,D+2,H+2,Wt,(T+2)*C)
            views = [
                wins[:, dz : dz + D, dy : dy + H]
                for dz in range(3) for dy in range(3)
            ]
            lhs = jnp.stack(views, axis=-2)  # (B,D,H,Wt,9,(T+2)*C)
            out = lax.dot_general(
                lhs, M, (((4, 5), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.reshape(B, D, H, Wp, Co)[:, :, :, :W].astype(x.dtype)

        return f

    def np_dtype(a, dtype):
        return jnp.asarray(np.asarray(a, np.float32), dtype)

    def build(sname, k_np, dtype):
        """-> (run_fn, constant operand) or None if inapplicable."""
        if sname == "xla":
            return conv_xla, np_dtype(k_np, dtype)
        if sname == "ncdhw":
            return conv_ncdhw, np_dtype(k_np, dtype)
        if sname == "im2col":
            C, Co = k_np.shape[3], k_np.shape[4]
            return conv_im2col, np_dtype(k_np.reshape(27 * C, Co), dtype)
        if sname.startswith("packed"):
            T = int(sname[len("packed"):])
            return conv_packed(T), np_dtype(pack_block_diag(k_np, T), dtype)
        if sname.startswith("banded"):
            T = int(sname[len("banded"):])
            return conv_banded(T), np_dtype(pack_banded(k_np, T), dtype)
        if sname.startswith("pallas"):
            from robustmvd_tpu.ops.pallas.conv3d import conv3d_banded_pallas

            T = int(sname[len("pallas"):]) if len(sname) > 6 else None

            def f(x, k, T=T):
                return conv3d_banded_pallas(x, k, T, 4, False)

            return f, np_dtype(k_np, dtype)
        raise ValueError(sname)

    return build


LAYERS = [
    # name, (B, D, H, W, Cin), Cout  — CostRegNet at a 256x320 input
    ("conv0_32to8_full", (1, 256, 64, 80, 32), 8),
    ("c8to8_full", (1, 256, 64, 80, 8), 8),  # deconv11-output-scale proxy
    ("conv2_16to16_half", (1, 128, 32, 40, 16), 16),
    ("conv4_32to32_quarter", (1, 64, 16, 20, 32), 32),
    ("conv6_64to64_eighth", (1, 32, 8, 10, 64), 64),
    ("prob_8to1_full", (1, 256, 64, 80, 8), 1),
]


def main(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from robustmvd_tpu.utils.platform import enable_compilation_cache
    from robustmvd_tpu.utils.profiler import time_fn

    enable_compilation_cache()
    dtype = jnp.dtype(args.dtype)
    build = make_strategies(jnp, lax)
    rng = np.random.RandomState(0)

    for name, shape, Co in LAYERS:
        B, D, H, W, C = shape
        x = jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
        k_np = (rng.randn(3, 3, 3, C, Co) * (27 * C) ** -0.5).astype(np.float32)
        ref = None
        useful_flops = 2 * 27 * C * Co * B * D * H * W

        # K distinct pre-staged inputs: one jitted program runs the conv K
        # times (no CSE across different operands) and returns ONE scalar,
        # so the tunnel round-trip + 4-byte fetch is amortized over K convs
        # instead of dominating the measurement (a full-output fetch of the
        # 21 MB conv0 volume costs ~150 ms on the tunneled backend).
        K = args.reps
        xs = tuple(
            jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
            for _ in range(K)
        )

        for sname in args.strategies:
            if sname[-2:].isdigit() or sname[-1:].isdigit():
                T = int("".join(c for c in sname if c.isdigit()))
                if T > W:
                    continue
            fn, const = build(sname, k_np, dtype)
            jitted = jax.jit(fn)

            def many(xs_, c, fn=fn):
                return sum(
                    jnp.sum(fn(xi, c), dtype=jnp.float32) for xi in xs_
                )

            jmany = jax.jit(many)
            try:
                out = jitted(x, const)
                got = np.asarray(out, np.float32)
                if ref is None:
                    ref, err = got, 0.0
                else:
                    err = float(
                        np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-12)
                    )
                sec = time_fn(jmany, xs, const, iters=args.iters, burn_in=3) / K
            except Exception as e:  # noqa: BLE001
                print(f"{name:24s} {sname:10s} FAILED: {type(e).__name__}: {e}")
                continue
            mfu = useful_flops / sec / 197e12
            print(
                json.dumps(
                    {
                        "layer": name,
                        "strategy": sname,
                        "ms": round(sec * 1e3, 3),
                        "useful_mfu_pct": round(100 * mfu, 2),
                        "rel_err_vs_xla": round(err, 5),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--reps", type=int, default=8,
                   help="convs per dispatch (amortizes tunnel overhead)")
    p.add_argument(
        "--strategies",
        nargs="+",
        default=["xla", "ncdhw", "im2col", "packed16", "packed8", "packed4",
                 "banded14", "banded6"],
    )
    main(p.parse_args())
