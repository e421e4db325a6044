"""Mesh context: sharding annotations inside model code.

Model forwards call :func:`constrain` on their big intermediates; with an
active mesh the constraint pins the named axes (data/view/hyp) and XLA's
GSPMD partitioner inserts the collectives (all-gathers for the fused
volume, psums for view reductions) over ICI. Without a mesh the calls are
no-ops, so the same model code runs single-chip.

This replaces the reference's parallelism story (single-process
nn.DataParallel, rmvd/models/helpers.py:163-169) with first-class
mesh partitioning of the batch, source-view and depth-hypothesis axes
(SURVEY §2.10 / §5 "long-context" analogue).
"""

from __future__ import annotations

import contextlib
import threading

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_state = threading.local()


def get_mesh():
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def use_mesh(mesh):
    """Activate a mesh for sharding annotations within the block."""
    prev = get_mesh()
    _state.mesh = mesh
    try:
        yield mesh
    finally:
        _state.mesh = prev


def constrain(x, *spec):
    """Pin ``x`` to PartitionSpec(*spec) if a mesh is active; no-op otherwise.

    Axis names not present in the active mesh are replaced by None so the
    same annotations work on data-only meshes.
    """
    mesh = get_mesh()
    if mesh is None:
        return x
    names = set(mesh.axis_names)
    clean = tuple(s if (s is None or s in names) else None for s in spec)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*clean)))
