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


_TRAIN_WORKER = r"""
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from robustmvd_tpu.parallel import MeshSpec, init_distributed, make_mesh

coord = sys.argv[1]
pid = int(sys.argv[2])

init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2

from robustmvd_tpu.data import create_dataset
from robustmvd_tpu.loss import create_loss
from robustmvd_tpu.models import create_model
from robustmvd_tpu.optim import create_optimizer, create_scheduler
from robustmvd_tpu.train.multi_view_depth_training import MultiViewDepthTraining

B_GLOBAL, V, H, W = 4, 2, 64, 64


def make_model():
    return create_model(
        "robust_mvd", pretrained=False, weights=None, train=True,
        remat=False, num_sampling_points=32, seed=0,
    )


def make_batch(ids):
    # deterministic per GLOBAL sample id, so both processes and the
    # unsharded reference agree on the batch contents
    images, gts = [], []
    for i in ids:
        r = np.random.RandomState(100 + i)
        images.append(r.rand(V, H, W, 3).astype(np.float32) - 0.4)
        gts.append((1.0 / (2.0 + 8.0 * r.rand(H, W, 1))).astype(np.float32))
    B = len(ids)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    poses[:, 1, 0, 3] = 0.1
    intr = np.tile(
        np.array([[0.8, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1]], np.float32), (B, V, 1, 1)
    )
    si = {
        "images": np.stack(images),
        "poses": poses,
        "intrinsics": intr,
        "keyview_idx": np.zeros((B,), np.int32),
    }
    gt = {"invdepth": np.stack(gts)}
    return si, gt


def make_training(mesh):
    model = make_model()
    dataset = create_dataset(
        "synthetic.train.mvd", num_samples=8, num_views=V, height=H, width=W
    )
    optimizer = create_optimizer("adam", model=model, lr=1e-4)
    scheduler = create_scheduler("flownet_scheduler", optimizer=optimizer)
    loss = create_loss("robust_mvd_loss", model=model)
    return MultiViewDepthTraining(
        out_dir=tempfile.mkdtemp(),
        model=model,
        dataset=dataset,
        optimizer=optimizer,
        scheduler=scheduler,
        loss=loss,
        batch_size=2,
        max_iterations=1,
        grad_clip_max_norm=5.0,
        num_workers=0,
        mesh=mesh,
        verbose=False,
    )


mesh = make_mesh(MeshSpec(data=4, view=1, hyp=1))
training = make_training(mesh)

# process-spanning global batch: this process contributes rows
# [2*pid, 2*pid+1] of the global batch [0, 1, 2, 3]
si_local, gt_local = make_batch([2 * pid, 2 * pid + 1])
new_state, loss_val, _ = training._train_step(training.state, si_local, gt_local)
sharded_loss = float(jax.device_get(loss_val))
sharded_params = jax.device_get(new_state["variables"]["params"])

# unsharded single-process reference on the FULL global batch (identical
# init: same model seed); mesh=None path of the same engine
ref_training = make_training(mesh=None)
si_full, gt_full = make_batch([0, 1, 2, 3])
si_full = {k: jnp.asarray(v) for k, v in si_full.items()}
gt_full = {k: jnp.asarray(v) for k, v in gt_full.items()}
ref_state, ref_loss_val, _ = ref_training._train_step(
    ref_training.state, si_full, gt_full
)
ref_loss = float(jax.device_get(ref_loss_val))
ref_params = jax.device_get(ref_state["variables"]["params"])

assert abs(sharded_loss - ref_loss) <= 1e-4 * abs(ref_loss) + 1e-8, (
    sharded_loss, ref_loss,
)
ref_flat = {
    jax.tree_util.keystr(p): np.asarray(v)
    for p, v in jax.tree_util.tree_leaves_with_path(ref_params)
}
sh_flat = {
    jax.tree_util.keystr(p): np.asarray(v)
    for p, v in jax.tree_util.tree_leaves_with_path(sharded_params)
}
assert ref_flat.keys() == sh_flat.keys()
for name, r in ref_flat.items():
    s = sh_flat[name]
    # adam normalizes near-zero grads, so cross-device reduction
    # reassociation can flip an update by ~lr on isolated elements
    atol = 1e-4 * (float(np.max(np.abs(r))) + 1e-12) + 1e-5
    np.testing.assert_allclose(s, r, rtol=1e-3, atol=atol, err_msg=name)

print(f"proc {pid} TRAINSTEP OK loss={sharded_loss}", flush=True)
"""


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    """One data-parallel train step with a process-spanning global batch
    (2 processes x 2 devices) through the TRAINING ENGINE must produce the
    same loss and updated parameters as the unsharded single-process step
    on the full batch — the launcher -> training integration across a real
    process boundary (VERDICT r03 item 8)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
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
            out, _ = p.communicate(timeout=500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} TRAINSTEP OK" in out, out[-2000:]
