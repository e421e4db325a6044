"""sample_data generator geometry: the procedurally generated inference demo

scene (robustmvd_tpu/data/scripts/make_sample_data.py) must be consistent
with the framework's epipolar ops — warping each source view back to the
key view at the ground-truth plane depth reproduces the key image. This
cross-checks the ``to_ref_transform`` convention used by inference.py's
load_data (reference: inference.py:18-55) against ops/epipolar.py."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from robustmvd_tpu.ops.epipolar import make_epipolar_coeffs, planesweep_points
from robustmvd_tpu.ops.sampling import bilinear_sample


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from robustmvd_tpu.data.scripts.make_sample_data import main

    out = tmp_path_factory.mktemp("sample_data")
    main(str(out), height=96, width=128)
    return out


def test_sources_warp_back_to_key(scene):
    import sys

    sys.path.insert(0, "/root/repo")
    from inference import load_data

    sample, h, w = load_data(str(scene))
    gt_depth = np.load(scene / "gt_depth_key.npy")  # (H, W)

    key_img = sample["images"][0]  # (3, H, W)
    rel = np.array([[w, w, w], [h, h, h], [1, 1, 1]], np.float32)

    gt_invdepth = jnp.asarray(1.0 / gt_depth)[None, None]  # (1, 1, H, W)

    for v in range(1, len(sample["images"])):
        coeffs = make_epipolar_coeffs(
            jnp.asarray(sample["intrinsics"][0] / rel)[None],
            jnp.asarray(sample["intrinsics"][v] / rel)[None],
            jnp.asarray(sample["poses"][v])[None],
            h,
            w,
        )
        us, vs, vis = planesweep_points(coeffs, gt_invdepth)
        src = jnp.asarray(sample["images"][v].transpose(1, 2, 0))[None]  # NHWC
        warped, in_bounds = bilinear_sample(src, us[:, 0] - 0.5, vs[:, 0] - 0.5)
        warped = np.asarray(warped[0])  # (H, W, 3)
        mask = np.asarray(in_bounds[0] * vis[0, 0])  # (H, W)

        # interior of the overlap: the warp must reproduce the key image
        assert mask.mean() > 0.5, "source view barely overlaps the key"
        diff = np.abs(warped - key_img.transpose(1, 2, 0)) * mask[..., None]
        mae = diff.sum() / (mask.sum() * 3)
        assert mae < 3.0, f"view {v}: photometric MAE {mae:.2f} (0..255 scale)"

        # control: a wrong depth must NOT reproduce the key image
        us_w, vs_w, _ = planesweep_points(coeffs, gt_invdepth * 2.0)
        warped_w, ib_w = bilinear_sample(src, us_w[:, 0] - 0.5, vs_w[:, 0] - 0.5)
        mask_w = np.asarray(ib_w[0]) * mask
        diff_w = np.abs(np.asarray(warped_w[0]) - key_img.transpose(1, 2, 0))
        mae_w = (diff_w * mask_w[..., None]).sum() / (mask_w.sum() * 3)
        assert mae_w > 3 * mae, f"view {v}: wrong depth too similar ({mae_w:.2f})"
