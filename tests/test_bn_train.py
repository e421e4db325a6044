"""Batch-stats BatchNorm training mode for vis_mvsnet.

The reference trains Vis-MVSNet with BN in train mode (updating running
statistics, rmvd/models/helpers.py:156-160 + vis_mvsnet_unet_modular.py);
bn_mode="batch" (default for train=True) mirrors that, bn_mode="frozen"
keeps round-4's running-average behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from robustmvd_tpu.models import create_model


def _inputs(rng, B=1, V=2, H=64, W=64):
    images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    poses[:, 1, 0, 3] = 0.1
    K = np.array([[W * 0.8, 0, W / 2], [0, W * 0.8, H / 2], [0, 0, 1]], np.float32)
    return dict(
        images=images,
        poses=jnp.asarray(poses),
        intrinsics=jnp.asarray(np.tile(K, (B, V, 1, 1))),
        keyview_idx=jnp.zeros((B,), jnp.int32),
        depth_range=(jnp.full((B,), 2.0), jnp.full((B,), 10.0)),
    )


def test_mutable_bn_updates_stats(rng):
    m = create_model(
        "vis_mvsnet", pretrained=False, weights=None, train=True,
        num_sampling_steps=16,
    )
    assert m.has_mutable_bn
    si = _inputs(rng)
    (pred, aux), new_stats = m.apply_fn_mutable(m.variables, **si)
    old = jax.tree_util.tree_leaves(m.variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_stats)
    assert len(old) == len(new)
    changed = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
        for a, b in zip(old, new)
    )
    assert changed > 0, "no BN statistic moved in batch mode"
    assert np.isfinite(np.asarray(pred["depth"], np.float32)).all()


def test_frozen_bn_mode_keeps_stats(rng):
    m = create_model(
        "vis_mvsnet", pretrained=False, weights=None, train=True,
        bn_mode="frozen", num_sampling_steps=16,
    )
    assert not m.has_mutable_bn
    si = _inputs(rng)
    pred, aux = m.apply_fn(m.variables, **si)
    assert np.isfinite(np.asarray(pred["depth"], np.float32)).all()


def test_trainer_threads_bn_stats(rng, tmp_path):
    """One real train step updates state['variables']['batch_stats']."""
    from robustmvd_tpu.data import create_dataset
    from robustmvd_tpu.loss import create_loss
    from robustmvd_tpu.optim import create_optimizer, create_scheduler
    from robustmvd_tpu.train.multi_view_depth_training import (
        MultiViewDepthTraining,
    )

    model = create_model(
        "vis_mvsnet", pretrained=False, weights=None, train=True,
        num_sampling_steps=16,
    )
    dataset = create_dataset(
        "synthetic.train.mvd", num_samples=2, num_views=2, height=64, width=64
    )
    optimizer = create_optimizer("adam", model=model, lr=1e-4)
    scheduler = create_scheduler("flownet_scheduler", optimizer=optimizer)
    loss = create_loss("vismvsnet_loss", model=model)
    training = MultiViewDepthTraining(
        out_dir=str(tmp_path),
        model=model,
        dataset=dataset,
        optimizer=optimizer,
        scheduler=scheduler,
        loss=loss,
        batch_size=1,
        max_iterations=1,
        num_workers=0,
        verbose=False,
    )
    before = jax.tree_util.tree_leaves(
        training.state["variables"]["batch_stats"]
    )
    before = [np.asarray(x).copy() for x in before]
    training()
    after = jax.tree_util.tree_leaves(
        training.state["variables"]["batch_stats"]
    )
    changed = sum(
        float(np.abs(a - np.asarray(b)).max()) > 0
        for a, b in zip(before, after)
    )
    assert changed > 0, "train step did not thread updated BN stats"
