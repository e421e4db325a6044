"""Profiling: jax.profiler traces + burn-in step timing.

The reference only has wall-clock timing with burn-in exclusion
(rmvd/utils/writer.py:303-329 `TimeWriter`;
rmvd/eval/multi_view_depth_evaluation.py:549-572). The TPU build adds real
profiler traces (XPlane, viewable in TensorBoard/Perfetto) plus the same
burn-in convention, and device-memory stats in place of torch.cuda
counters.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax.profiler trace into ``log_dir``.

    View with TensorBoard's profile plugin or ui.perfetto.dev."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_fetch(out):
    """Force execution of ``out``'s program with a host fetch.

    On the tunneled TPU backend ``block_until_ready`` returns before the
    device work completes (PARITY.md measurement rule), so timing must be
    bounded by an actual device->host copy. Device execution is in-order:
    fetching ONE array of the most recently dispatched program bounds all
    prior work, so only the first array leaf is copied.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            np.asarray(leaf)
            return out
    return out


def time_fn(fn, *args, iters=10, burn_in=3, force=None):
    """Steady-state timing of a jitted fn with burn-in samples excluded.

    ``force`` converts the output to something whose fetch forces
    execution; defaults to :func:`force_fetch` (a host copy of one output
    leaf — NOT block_until_ready, which does not sync on the tunneled
    backend). Returns seconds/iter.
    """
    if force is None:
        force = force_fetch

    for _ in range(burn_in):
        force(fn(*args))
    start = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - start) / iters


def device_memory_stats(device=None):
    """Peak/current device memory in MiB (the torch.cuda.max_memory_*

    analogue; availability depends on the backend)."""
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return {}
    out = {}
    if stats:
        for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if key in stats:
                out[key.replace("bytes", "mib")] = int(stats[key] / 1024 / 1024)
    return out
