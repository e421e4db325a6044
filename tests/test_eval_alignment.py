"""Eval-engine alignment paths: median scaling and the closed-form

least-squares scale/shift solve (reference:
multi_view_depth_evaluation.py:478-529)."""

import numpy as np
import pytest

from robustmvd_tpu.eval.multi_view_depth_evaluation import MultiViewDepthEvaluation


def _postprocess(alignment, pred_depth, gt_depth):
    ev = MultiViewDepthEvaluation(out_dir=None, alignment=alignment, verbose=False)
    sample_gt = {"depth": gt_depth}
    pred = {"depth": pred_depth}
    ev._postprocess_sample_and_output({}, sample_gt, pred)
    return pred


def test_median_alignment_recovers_scale(rng):
    gt = rng.rand(1, 1, 16, 16).astype(np.float32) * 5 + 1
    pred = gt / 3.0  # predicted at 1/3 scale
    out = _postprocess("median", pred.copy(), gt)
    assert out["scaling_factor"] == pytest.approx(3.0, rel=1e-5)
    np.testing.assert_allclose(out["depth"], gt, rtol=1e-5)


def test_least_squares_scale_shift_recovers_affine(rng):
    gt = rng.rand(1, 1, 16, 16).astype(np.float32) * 5 + 1
    gt_inv = 1 / gt
    # prediction whose INVERSE depth is an affine transform of gt invdepth
    pred_inv = (gt_inv - 0.05) / 2.0
    pred = 1 / pred_inv
    out = _postprocess("least_squares_scale_shift", pred.copy(), gt)
    assert out["least_squares_scale"] == pytest.approx(2.0, rel=1e-3)
    assert out["least_squares_shift"] == pytest.approx(0.05, abs=1e-4)
    np.testing.assert_allclose(out["depth"], gt, rtol=1e-3)


def test_clipping_applies(rng):
    gt = np.full((1, 1, 8, 8), 5.0, np.float32)
    pred = np.full((1, 1, 8, 8), 1000.0, np.float32)
    out = _postprocess(None, pred.copy(), gt)
    assert out["depth"].max() == pytest.approx(100.0)
    pred2 = np.full((1, 1, 8, 8), 0.01, np.float32)
    out2 = _postprocess(None, pred2.copy(), gt)
    assert out2["depth"].min() == pytest.approx(0.1)
