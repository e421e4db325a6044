"""MVSNet with the lane-packed CostRegNet convs == the xla path.

conv3d_impl is a pure lowering choice (ops/conv3d.py): identical
parameters, identical depth maps. This pins the full-model equivalence so
the bench can flip the default implementation without a parity risk.
"""

import numpy as np
import pytest

from robustmvd_tpu.models import create_model


def _inputs(rng, V=3, H=64, W=96):
    images = [rng.rand(1, 3, H, W).astype(np.float32) * 255 for _ in range(V)]
    K = np.array([[[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]]], np.float32)
    poses = [np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)) for _ in range(V)]
    for i in range(1, V):
        poses[i][:, 0, 3] = 0.1 * i
    return dict(
        images=images,
        keyview_idx=np.array([0]),
        poses=poses,
        intrinsics=[K.copy() for _ in range(V)],
    )


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["banded", "packed"])
def test_mvsnet_packed_conv3d_matches_xla(rng, impl):
    inputs = _inputs(rng)

    ref_model = create_model(
        "mvsnet_train",
        pretrained=False,
        weights=None,
        num_sampling_steps=32,
        conv3d_impl="xla",
    )
    packed_model = create_model(
        "mvsnet_train",
        pretrained=False,
        weights=None,
        num_sampling_steps=32,
        conv3d_impl=impl,
    )
    # identical parameter trees: transplant the xla-init weights
    packed_model.variables = ref_model.variables

    ref_pred, _ = ref_model.run(**inputs)
    packed_pred, _ = packed_model.run(**inputs)
    np.testing.assert_allclose(
        np.asarray(packed_pred["depth"]),
        np.asarray(ref_pred["depth"]),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.slow
def test_vis_mvsnet_banded_conv3d_matches_xla(rng):
    inputs = _inputs(rng)
    ref_model = create_model(
        "vis_mvsnet",
        pretrained=False,
        weights=None,
        num_sampling_steps=32,
        conv3d_impl="xla",
    )
    banded_model = create_model(
        "vis_mvsnet",
        pretrained=False,
        weights=None,
        num_sampling_steps=32,
        conv3d_impl="banded",
    )
    banded_model.variables = ref_model.variables
    ref_pred, _ = ref_model.run(**inputs)
    banded_pred, _ = banded_model.run(**inputs)
    np.testing.assert_allclose(
        np.asarray(banded_pred["depth"]),
        np.asarray(ref_pred["depth"]),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.slow
def test_cvp_mvsnet_banded_conv3d_matches_xla(rng):
    from tests_common import random_pose_np

    V = 3
    inputs = _inputs(rng, V=V)
    # CVP's epipolar interval solve is singular for pure-axis translations
    inputs["poses"] = [np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))] + [
        np.tile(random_pose_np(rng, 0.1, 0.2), (1, 1, 1)) for _ in range(V - 1)
    ]
    ref_model = create_model(
        "cvp_mvsnet", pretrained=False, weights=None, nscale=3, conv3d_impl="xla"
    )
    banded_model = create_model(
        "cvp_mvsnet", pretrained=False, weights=None, nscale=3, conv3d_impl="banded"
    )
    banded_model.variables = ref_model.variables
    ref_pred, _ = ref_model.run(**inputs)
    banded_pred, _ = banded_model.run(**inputs)
    np.testing.assert_allclose(
        np.asarray(banded_pred["depth"]),
        np.asarray(ref_pred["depth"]),
        rtol=1e-4,
        atol=1e-4,
    )
