"""launch.py: the per-host launcher's --local emulation end-to-end.

Two spawned processes pick up the launcher's env contract through
``init_distributed_from_env`` (the exact call train.py makes), form the
shared global mesh, and reduce across process boundaries
(SURVEY §2.10 launcher row).
"""

import os
import os.path as osp
import subprocess
import sys

import pytest

_PROBE = r"""
import jax
import jax.numpy as jnp
import numpy as np

from robustmvd_tpu.parallel import MeshSpec, make_mesh
from robustmvd_tpu.parallel.mesh import init_distributed_from_env

assert init_distributed_from_env(), "launcher env contract missing"
assert jax.process_count() == 2, jax.process_count()

mesh = make_mesh(MeshSpec(data=jax.device_count(), view=1, hyp=1))
from jax.sharding import NamedSharding, PartitionSpec as P

n = jax.device_count()
sharding = NamedSharding(mesh, P(("data",)))
local = np.ones((len(jax.local_devices()), 4), np.float32) * (jax.process_index() + 1)
arrs = [jax.device_put(local[i : i + 1], d) for i, d in enumerate(jax.local_devices())]
garr = jax.make_array_from_single_device_arrays((n, 4), sharding, arrs)
out = float(jax.jit(jnp.sum)(garr))
assert abs(out - (1 + 2) * (n // 2) * 4) < 1e-6, out
print(f"probe process {jax.process_index()} ok", flush=True)
"""


@pytest.mark.slow
def test_launch_local_two_processes(tmp_path):
    probe = tmp_path / "probe.py"
    probe.write_text(_PROBE)
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))

    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [
            sys.executable,
            osp.join(repo, "launch.py"),
            "--local", "2",
            "--devices_per_process", "2",
            "--timeout", "360",
            "--",
            str(probe),
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo,
        timeout=400,
    )
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-2000:]
    assert "[proc 0] probe process 0 ok" in result.stdout, result.stdout[-2000:]
    assert "[proc 1] probe process 1 ok" in result.stdout, result.stdout[-2000:]


def test_launch_requires_script():
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    result = subprocess.run(
        [sys.executable, osp.join(repo, "launch.py"), "--local", "2"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert result.returncode != 0
    assert "no script" in result.stderr
