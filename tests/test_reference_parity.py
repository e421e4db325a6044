"""Numerical parity against the ACTUAL reference implementation.

Imports the reference rmvd package (read-only, with stub modules for deps
absent in this environment) and compares:
- the plane-sweep correlation op output (corr + mask),
- the full RobustMVD forward with weights converted from the torch model's
  state_dict through robustmvd_tpu/models/weights.py — the same path that
  imports the released pretrained checkpoints.

These tests are skipped when the reference checkout is unavailable.
"""

import os.path as osp
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not osp.isdir(REF), reason="reference unavailable")


def _install_reference_stubs():
    from tests_common import install_reference_stubs

    install_reference_stubs()


@pytest.fixture(scope="module")
def reference():
    _install_reference_stubs()
    import rmvd.models.blocks.planesweep_corr  # noqa: F401
    import rmvd.models.robust_mvd  # noqa: F401

    return sys.modules["rmvd"]


@pytest.mark.parametrize(
    "impl,atol",
    [
        ("matmul", 1e-5),
        # the default production impl: coordinates are computed inside the
        # scan via reciprocal-multiply (vs the reference's divides), which
        # shifts sampling positions by ~1 ulp — amplified near the epipole,
        # hence the looser tolerance (error vs a float64 oracle is the same
        # or smaller than the matmul impl's).
        ("pixelscan", 5e-3),
    ],
)
def test_planesweep_correlation_parity(reference, rng, impl, atol):
    import torch

    from tests_common import random_pose_np

    import jax.numpy as jnp

    from robustmvd_tpu.ops.corr import planesweep_correlation_single
    from robustmvd_tpu.ops.epipolar import sampling_invdepths

    ref_pc = sys.modules["rmvd.models.blocks.planesweep_corr"]

    B, H, W, C, S = 1, 12, 16, 32, 9
    feat_key = rng.randn(B, C, H, W).astype(np.float32)
    feat_src = rng.randn(B, C, H, W).astype(np.float32)
    K = np.array([[1.1, 0, 0.5], [0, 1.4, 0.5], [0, 0, 1]], dtype=np.float32)[None]
    T = random_pose_np(rng)[None]

    corr_block = ref_pc.PlanesweepCorrelation(warp_only=False, normalize="dim")
    with torch.no_grad():
        corrs, masks, _ = corr_block(
            feat_key=torch.from_numpy(feat_key),
            intrinsics_key=torch.from_numpy(K),
            feat_sources=[torch.from_numpy(feat_src)],
            source_to_key_transforms=[torch.from_numpy(T)],
            intrinsics_sources=[torch.from_numpy(K)],
            num_sampling_points=S,
            min_depth=0.5,
            max_depth=100.0,
        )
    ref_corr = corrs[0].numpy()
    ref_mask = masks[0].numpy()

    my_corr, my_mask = planesweep_correlation_single(
        jnp.asarray(feat_key.transpose(0, 2, 3, 1)),
        jnp.asarray(feat_src.transpose(0, 2, 3, 1)),
        jnp.asarray(K),
        jnp.asarray(K),
        jnp.asarray(T),
        jnp.asarray(np.asarray(sampling_invdepths(0.5, 100.0, S))),
        impl=impl,
    )
    my_corr = np.asarray(my_corr).transpose(0, 3, 1, 2)
    my_mask = np.asarray(my_mask).transpose(0, 3, 1, 2)

    np.testing.assert_array_equal(my_mask, ref_mask)
    np.testing.assert_allclose(my_corr, ref_corr, atol=atol, rtol=atol)


@pytest.mark.slow
def test_robust_mvd_full_model_parity(reference, rng):
    """Reference torch RobustMVD (random init) -> state_dict -> converted

    flax weights -> identical forward outputs. Validates every block, the
    weight converter, and therefore the pretrained-checkpoint import path."""
    import torch

    from tests_common import random_pose_np

    import jax
    import jax.numpy as jnp

    from robustmvd_tpu.models.robust_mvd import RobustMVDModule
    from robustmvd_tpu.models.weights import convert_torch_state_dict

    ref_mod = sys.modules["rmvd.models.robust_mvd"]
    torch.manual_seed(0)
    tmodel = ref_mod.RobustMVD()
    tmodel.eval()

    B, V, H, W = 1, 3, 64, 128
    images = [rng.rand(B, 3, H, W).astype(np.float32) - 0.4 for _ in range(V)]
    K_rel = np.array(
        [[0.9, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], dtype=np.float32
    )[None]
    intrinsics = [K_rel.copy() for _ in range(V)]
    poses = [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))]
    poses += [np.tile(random_pose_np(rng, 0.1, 0.2), (B, 1, 1)) for _ in range(V - 1)]

    with torch.no_grad():
        tpred, _ = tmodel(
            images=[torch.from_numpy(im) for im in images],
            poses=[torch.from_numpy(p) for p in poses],
            intrinsics=[torch.from_numpy(k) for k in intrinsics],
            keyview_idx=0,
        )
    ref_depth = tpred["depth"].numpy()
    ref_unc = tpred["depth_uncertainty"].numpy()

    variables = convert_torch_state_dict(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}
    )
    module = RobustMVDModule()
    jpred, _ = module.apply(
        variables,
        jnp.asarray(np.stack(images, 1).transpose(0, 1, 3, 4, 2)),
        jnp.asarray(np.stack(poses, 1)),
        jnp.asarray(np.stack(intrinsics, 1)),
        jnp.asarray(np.zeros((B,), np.int32)),
    )
    my_depth = np.asarray(jpred["depth"]).transpose(0, 3, 1, 2)
    my_unc = np.asarray(jpred["depth_uncertainty"]).transpose(0, 3, 1, 2)

    # compare in inverse-depth space (depth = 1/(invdepth+1e-9) blows up
    # relative error at near-zero invdepth)
    np.testing.assert_allclose(1 / my_depth, 1 / ref_depth, atol=1e-4, rtol=1e-3)
    finite = ref_unc < 1e6
    np.testing.assert_allclose(
        my_unc[finite], ref_unc[finite], atol=1e-3, rtol=1e-2
    )
