"""Mesh sharding: the sharded forward must match the unsharded forward

bit-for-tolerance on a virtual 8-device CPU mesh, across data/view/hyp
splits. Also covers MeshSpec resolution and the scaling-bench harness path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustmvd_tpu.models import create_model
from robustmvd_tpu.parallel import MeshSpec, make_mesh
from robustmvd_tpu.parallel.context import use_mesh


def _sample(rng, B, V, H, W):
    images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32) - 0.4)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for i in range(1, V):
        poses[:, i, 0, 3] = 0.1 * i
        poses[:, i, 1, 3] = 0.05
    intr = np.tile(
        np.array([[0.8, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1]], dtype=np.float32),
        (B, V, 1, 1),
    )
    kv = np.zeros((B,), np.int32)
    return images, jnp.asarray(poses), jnp.asarray(intr), jnp.asarray(kv)


def test_mesh_spec_resolution(cpu_devices):
    assert MeshSpec(data=-1, view=2, hyp=2).resolve(8) == (2, 2, 2)
    assert MeshSpec(data=8).resolve(8) == (8, 1, 1)
    with pytest.raises(AssertionError):
        MeshSpec(data=3, view=2, hyp=2).resolve(8)
    mesh = make_mesh(MeshSpec(data=2, view=2, hyp=2), devices=cpu_devices)
    assert mesh.axis_names == ("data", "view", "hyp")


@pytest.mark.slow
@pytest.mark.parametrize("spec", [
    MeshSpec(data=2, view=2, hyp=2),
    MeshSpec(data=1, view=2, hyp=4),
])
def test_sharded_forward_matches_unsharded(cpu_devices, rng, spec):
    model = create_model("robust_mvd", pretrained=False, weights=None)
    B = spec.data  # batch divisible by the data axis
    V, H, W = 3, 64, 64  # V-1 = 2 source views divisible by the view axis
    args = _sample(rng, B, V, H, W)

    # compare inverse depth: depth = 1/(invdepth + 1e-9) amplifies fp noise
    # unboundedly at near-zero invdepth pixels
    _, ref_aux = jax.jit(lambda v, *a: model.module.apply(v, *a))(
        model.variables, *args
    )
    ref_invdepth = np.asarray(ref_aux["invdepth"])

    mesh = make_mesh(spec, devices=cpu_devices)
    with use_mesh(mesh):
        _, sh_aux = jax.jit(lambda v, *a: model.module.apply(v, *a))(
            model.variables, *args
        )
    sh_invdepth = np.asarray(sh_aux["invdepth"])

    np.testing.assert_allclose(sh_invdepth, ref_invdepth, rtol=1e-4, atol=1e-5)
