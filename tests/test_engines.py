"""End-to-end engine tests: training loop (with checkpoint/resume) and

evaluation engine on the synthetic dataset."""

import os.path as osp

import numpy as np
import pytest

from robustmvd_tpu import (
    create_dataset,
    create_evaluation,
    create_loss,
    create_model,
    create_optimizer,
    create_scheduler,
    create_training,
)
from robustmvd_tpu.data.transforms import (
    Compose,
    NormalizeImagesToMinMax,
    NormalizeIntrinsics,
)


def _tiny_dataset(n=4):
    return create_dataset(
        "synthetic.train.mvd",
        num_samples=n,
        num_views=2,
        height=64,
        width=64,
        augmentations=[Compose([NormalizeImagesToMinMax(-0.4, 0.6), NormalizeIntrinsics()])],
    )


@pytest.mark.slow
def test_training_runs_and_resumes(tmp_path):
    model = create_model("robust_mvd", pretrained=False, weights=None)
    dataset = _tiny_dataset()
    optimizer = create_optimizer("adam", model=model, lr=1e-4)
    scheduler = create_scheduler("flownet_scheduler", optimizer=optimizer)
    loss = create_loss("robust_mvd_loss", model=model)

    out_dir = str(tmp_path / "train")
    training = create_training(
        "mvd",
        out_dir=out_dir,
        model=model,
        dataset=dataset,
        optimizer=optimizer,
        scheduler=scheduler,
        loss=loss,
        batch_size=2,
        max_iterations=2,
        grad_clip_max_norm=5.0,
        num_workers=0,
        verbose=False,
    )
    state = training()
    assert int(state["step"]) == 2
    # final weights-only + full snapshots exist
    assert any(
        f.startswith("snapshot-iter-") for f in
        __import__("os").listdir(osp.join(out_dir, "weights_only_checkpoints_dir"))
    )

    # resume: a new engine picks up at iteration 2 and trains to 3
    model2 = create_model("robust_mvd", pretrained=False, weights=None)
    training2 = create_training(
        "mvd",
        out_dir=out_dir,
        model=model2,
        dataset=dataset,
        optimizer=optimizer,
        scheduler=scheduler,
        loss=create_loss("robust_mvd_loss", model=model2),
        batch_size=2,
        max_iterations=3,
        grad_clip_max_norm=5.0,
        num_workers=0,
        verbose=False,
    )
    assert training2.finished_iterations == 2
    state2 = training2()
    assert int(state2["step"]) == 3


@pytest.mark.slow
def test_evaluation_engine(tmp_path):
    model = create_model("robust_mvd", pretrained=False, weights=None)
    dataset = create_dataset(
        "synthetic.train.mvd", num_samples=5, num_views=3, height=64, width=96
    )
    out_dir = str(tmp_path / "eval")
    evaluation = create_evaluation(
        "mvd",
        out_dir=out_dir,
        inputs=["images", "intrinsics", "poses"],
        view_ordering="quasi-optimal",
        eval_uncertainty=True,
        verbose=False,
    )
    results = evaluation(dataset=dataset, model=model, samples=2, qualitatives=1, burn_in_samples=0)

    # results frame has per-view-count and "best" columns
    assert ("best", "absrel") in results.columns
    assert (1, "absrel") in results.columns
    assert (2, "absrel") in results.columns
    assert len(results) == 2
    assert np.isfinite(results[("best", "absrel")]).all()
    # ause computed
    assert ("best", "ause") in results.columns

    # outputs written + resume-skip works
    assert osp.exists(osp.join(out_dir, "results.csv"))
    assert osp.exists(osp.join(out_dir, ".results_df.pickle"))
    again = evaluation(dataset=dataset, model=model, samples=2)
    assert ("best", "absrel") in again.columns

    # dataset.cfg round trip: re-open the eval dataset with its prediction
    # updates applied (reference: dataset.py:256-304 + eval :712-730)
    cfg_path = osp.join(out_dir, "qualitative", "dataset.cfg")
    assert osp.exists(cfg_path)
    from robustmvd_tpu.data import create_dataset as cds

    ds2 = cds(cfg_path, verbose=False)
    assert len(ds2) >= 1  # restricted to samples with updates
    updated = ds2[0]
    assert "pred_depth" in updated  # the eval's qualitative overlay

    # viewer round-trip (reference: data_viewer.py + dataset.py:256-304):
    # the re-opened eval dataset renders headlessly through its eval
    # layout — the full eval -> dataset.cfg -> viewer export workflow
    from robustmvd_tpu.viewer import run_viewer

    export_dir = str(tmp_path / "viewer_export")
    layout_names = ds2.get_layout_names()
    eval_layouts = [n for n in layout_names if n.startswith("eval")]
    run_viewer(
        ds2,
        layout=eval_layouts[0] if eval_layouts else "default",
        export_dir=export_dir,
    )
    pages = __import__("os").listdir(export_dir)
    assert any(p.endswith(".png") for p in pages), pages


@pytest.mark.slow
def test_eval_runtime_measurement_sane(tmp_path):
    """runtime_model_in_msec guards: burn-in samples are NaN; measured

    samples are positive, finite, and within sanity bounds of a direct
    timing of the same jitted forward (the round-2 fix replaced a
    non-syncing block_until_ready with a pred-leaf host fetch; this pins
    that behavior — a silent regression to under-reported runtimes would
    trip the lower bound, an all-leaves eager fetch the upper one)."""
    from robustmvd_tpu.utils import numpy_collate
    from robustmvd_tpu.utils.profiler import time_fn

    model = create_model("robust_mvd", pretrained=False, weights=None)
    dataset = create_dataset(
        "synthetic.train.mvd", num_samples=6, num_views=2, height=64, width=96
    )
    evaluation = create_evaluation(
        "mvd",
        out_dir=None,
        inputs=["images", "intrinsics", "poses"],
        view_ordering="nearest",
        eval_uncertainty=False,
        verbose=False,
    )
    results = evaluation(dataset=dataset, model=model, burn_in_samples=3)

    rt = results[(1, "runtime_model_in_msec")]
    assert rt.iloc[:3].isna().all(), "burn-in samples must not be measured"
    measured = rt.iloc[3:]
    assert np.isfinite(measured).all() and (measured > 0).all()

    # direct timing of the identical jitted program (adapter excluded)
    sample = numpy_collate([dataset[0]])
    inputs = {
        k: v
        for k, v in sample.items()
        if k in ("images", "intrinsics", "poses", "keyview_idx")
    }
    adapted = model.input_adapter(**inputs)
    direct_ms = time_fn(lambda: model.forward(**adapted), iters=5, burn_in=2) * 1e3

    med = float(measured.median())
    assert med > 0.2 * direct_ms, (med, direct_ms)
    assert med < 20 * direct_ms, (med, direct_ms)
