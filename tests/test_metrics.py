"""Metrics vs brute-force oracles implementing the reference's semantics

(rmvd/eval/metrics.py:32-220), including the O(N^2) sparsification loop."""

import numpy as np
import pytest

from robustmvd_tpu.eval.metrics import (
    ause,
    m_rel_ae,
    pointwise_rel_ae,
    sparsification,
    thresh_inliers,
    valid_mean,
)


def test_m_rel_ae_basic():
    gt = np.array([[2.0, 4.0], [0.0, 8.0]])  # one invalid pixel
    pred = np.array([[1.0, 5.0], [3.0, 8.0]])
    # rel errors: 0.5, 0.25, (masked), 0 -> mean 0.25
    assert m_rel_ae(gt, pred) == pytest.approx(0.25)
    assert m_rel_ae(gt, pred, output_scaling_factor=100) == pytest.approx(25.0)


def test_m_rel_ae_all_invalid_nan():
    gt = np.zeros((4, 4))
    pred = np.ones((4, 4))
    assert np.isnan(m_rel_ae(gt, pred))


def test_thresh_inliers():
    gt = np.array([[2.0, 2.0, 2.0, 0.0]])
    pred = np.array([[2.0, 2.05, 2.5, 1.0]])
    # ratios: 1.0 (in), 1.025 (in), 1.25 (out), masked
    assert thresh_inliers(gt, pred, 1.03) == pytest.approx(2 / 3)


def test_thresh_inliers_pred_zero_is_outlier():
    gt = np.array([[2.0, 2.0]])
    pred = np.array([[0.0, 2.0]])
    assert thresh_inliers(gt, pred, 1.03) == pytest.approx(0.5)


def reference_sparsification_loop(gt, pred, uncertainty, mask):
    """Literal port of the reference's per-pixel loop (metrics.py:138-220)

    as a test oracle."""
    mask = (gt > 0).astype(np.float32) * mask

    y, x = np.unravel_index(
        np.argsort((uncertainty - uncertainty.min() + 1) * mask, axis=None, kind="stable"),
        uncertainty.shape,
    )
    ranking = np.flip(np.stack((x, y), axis=1), 0).tolist()

    num_valid = int(np.sum(mask.astype(bool)))
    steps = [int((num_valid / 100) * i) for i in range(100)]

    base_error = m_rel_ae(gt=gt, pred=pred, mask=mask)
    xs, ys = [], []
    num_masked = 0
    mask = mask.copy()
    for px, py in ranking:
        if num_masked >= num_valid:
            break
        if num_masked in steps:
            cur = m_rel_ae(gt=gt, pred=pred, mask=mask)
            if np.isfinite(cur):
                xs.append(num_masked / num_valid)
                ys.append(cur / base_error)
        mask[py, px] = 0
        num_masked += 1

    grid = np.linspace(0, 0.99, 100)
    if len(xs) > 1:
        return grid, np.interp(grid, xs, ys)
    return grid, np.full(100, np.nan)


@pytest.mark.parametrize("seed", [0, 1])
def test_sparsification_matches_reference_loop(seed):
    rng = np.random.RandomState(seed)
    H, W = 24, 32
    gt = rng.rand(H, W).astype(np.float32) * 10
    gt[rng.rand(H, W) < 0.2] = 0  # invalid pixels
    pred = gt + rng.randn(H, W).astype(np.float32)
    unc = rng.rand(H, W).astype(np.float32)
    mask = np.ones((H, W), np.float32)

    x1, fast = sparsification(gt.copy(), pred, unc, mask.copy())
    x2, slow = reference_sparsification_loop(gt.copy(), pred, unc, mask.copy())
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-7)


def test_ause_oracle_is_better():
    rng = np.random.RandomState(3)
    H, W = 16, 16
    gt = rng.rand(H, W).astype(np.float32) * 10 + 1
    pred = gt + rng.randn(H, W).astype(np.float32)
    # perfect uncertainty = true error -> AUSE ~ 0
    err = pointwise_rel_ae(gt, pred)
    a0, _, _ = ause(gt, pred, err)
    assert a0 == pytest.approx(0.0, abs=1e-6)
    # random uncertainty -> AUSE > 0
    a1, _, _ = ause(gt, pred, rng.rand(H, W).astype(np.float32))
    assert a1 > 0
