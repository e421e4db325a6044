"""Device-mesh management and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(rmvd/models/helpers.py:163-169). Here parallelism is a first-class mesh
abstraction: a ``Mesh`` with named axes

    ("data", "view", "hyp")

- ``data``: batch/data parallelism (gradients psum over this axis),
- ``view``: source views sharded across chips (correlation volumes are
  fused with a weighted-sum psum — LearnedFusion is associative),
- ``hyp``: depth-hypothesis slabs sharded across chips (softargmin needs a
  global softmax over hypothesis slabs = max-psum + sum-psum).

XLA inserts the collectives from sharding annotations; multi-host setups
call :func:`init_distributed` first (``jax.distributed.initialize``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_VIEW = "view"
AXIS_HYP = "hyp"


@dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape; -1 on the data axis means "all remaining"."""

    data: int = -1
    view: int = 1
    hyp: int = 1

    def resolve(self, n_devices: int):
        data = self.data
        if data == -1:
            assert n_devices % (self.view * self.hyp) == 0, (
                f"{n_devices} devices not divisible by view*hyp = {self.view * self.hyp}"
            )
            data = n_devices // (self.view * self.hyp)
        total = data * self.view * self.hyp
        assert total == n_devices, (
            f"mesh {data}x{self.view}x{self.hyp} != {n_devices} devices"
        )
        return (data, self.view, self.hyp)


def make_mesh(spec: Optional[MeshSpec] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh over the given (or all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    spec = spec or MeshSpec()
    shape = spec.resolve(len(devices))
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, (AXIS_DATA, AXIS_VIEW, AXIS_HYP))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(AXIS_DATA))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host initialization (call once per host before building meshes)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def init_distributed_from_env(environ=None):
    """Multi-host init from the launcher's environment contract.

    ``launch.py`` (and any scheduler template) exports
    ``RMVD_TPU_COORDINATOR`` / ``RMVD_TPU_NUM_PROCESSES`` /
    ``RMVD_TPU_PROCESS_ID`` per host; the CLIs call this once at startup.
    No-op when the coordinator variable is unset (single-process, or a
    Cloud TPU pod where ``jax.distributed.initialize`` autodetects — pass
    ``RMVD_TPU_DIST_AUTO=1`` to request autodetection explicitly).

    Returns True if initialization ran.
    """
    import os

    env = os.environ if environ is None else environ
    if env.get("RMVD_TPU_COORDINATOR"):
        init_distributed(
            coordinator_address=env["RMVD_TPU_COORDINATOR"],
            num_processes=int(env.get("RMVD_TPU_NUM_PROCESSES", "1")),
            process_id=int(env.get("RMVD_TPU_PROCESS_ID", "0")),
        )
        return True
    if env.get("RMVD_TPU_DIST_AUTO"):
        init_distributed()
        return True
    return False
