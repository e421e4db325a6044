"""Two-process multi-host smoke test.

Spawns two real processes that call ``init_distributed`` (the
``jax.distributed.initialize`` wrapper used by train.py), build the shared
global mesh, and run a psum across process boundaries — the launcher path
that single-process CPU-mesh tests cannot cover (SURVEY §2.10 launcher
row; no reference equivalent — the reference is single-process
DataParallel, rmvd/models/helpers.py:163-169).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from robustmvd_tpu.parallel import MeshSpec, init_distributed, make_mesh

coord = sys.argv[1]
pid = int(sys.argv[2])

init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 virtual per process

mesh = make_mesh(MeshSpec(data=4, view=1, hyp=1))

from jax.sharding import NamedSharding, PartitionSpec as P

# one shard per device via global array construction
global_shape = (4, 8)
sharding = NamedSharding(mesh, P(("data",)))
local_data = np.full((1, 8), float(pid + 1), np.float32)
arrs = [
    jax.device_put(local_data, d)
    for d in jax.local_devices()
]
garr = jax.make_array_from_single_device_arrays(
    global_shape, sharding, arrs
)


@jax.jit
def total(x):
    return jnp.sum(x)

# global sum: process 0 contributes 2 rows of 1s, process 1 rows of 2s
out = float(total(garr))
expected = (1.0 + 2.0) * 2 * 8
assert abs(out - expected) < 1e-6, (out, expected)
print(f"proc {pid} OK sum={out}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = dict(os.environ)
    # must be set before the interpreter starts: sitecustomize pre-imports
    # jax, so in-script env mutation is too late to pick the CPU backend.
    # The TPU-tunnel sitecustomize (gated on PALLAS_AXON_POOL_IPS) would
    # otherwise initialize a backend at interpreter start, before
    # jax.distributed.initialize can register the process topology.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out, out[-2000:]
