#!/usr/bin/env python3
"""Convergence evidence: run the paper training recipe for a few hundred

iterations on the synthetic dataset and record the loss curve as an
artifact (docs/artifacts/loss_curve_r03.json).

Recipe (reference train_all.sh:49 / run_confs/robust_mvd.yaml): batch 4,
1+4 views, adam lr 1e-4, grad clip 5, flownet_scheduler, robust_mvd_loss.
At <2000 iterations the loss is in its deterministic MAE-warmup phase
(rmvd/loss/multi_scale_uni_laplace.py:100-115). Synthetic data has random
images, so the model converges toward the GT inverse-depth statistics —
the point is end-to-end optimization evidence on real hardware (grads,
clipping, schedule, checkpointing), not benchmark accuracy.

The vis_mvsnet variant (--model vis_mvsnet) runs the second trainable
model through the same engine with its own loss
(rmvd/loss/vismvsnet_multiscale_multiview_aggregate.py) and
ImageNet-normalized inputs + absolute intrinsics + depth_range inputs;
BatchNorm stays in running-average mode (frozen-BN training,
tests/test_vis_mvsnet_parity.py).

Usage: python tools/train_convergence.py [--model robust_mvd]
       [--iterations 400] [--height 384] [--width 768] [--dtype bfloat16]
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="robust_mvd",
                    choices=["robust_mvd", "vis_mvsnet"])
    ap.add_argument("--iterations", type=int, default=400)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--num_views", type=int, default=5)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--num_samples", type=int, default=64)
    ap.add_argument(
        "--out",
        default=osp.join(osp.dirname(__file__), "..", "docs", "artifacts", "loss_curve_r03.json"),
    )
    args = ap.parse_args()

    import jax

    from robustmvd_tpu.data import create_dataset
    from robustmvd_tpu.data.transforms import (
        Compose,
        NormalizeImagesByShiftAndScale,
        NormalizeImagesToMinMax,
        NormalizeIntrinsics,
    )
    from robustmvd_tpu.loss import create_loss
    from robustmvd_tpu.models import create_model
    from robustmvd_tpu.optim import create_optimizer, create_scheduler
    from robustmvd_tpu.train.multi_view_depth_training import MultiViewDepthTraining

    device_kind = jax.devices()[0].device_kind

    model = create_model(
        args.model, pretrained=False, weights=None, train=True, dtype=args.dtype
    )
    if args.model == "robust_mvd":
        augmentations = [
            Compose([NormalizeImagesToMinMax(-0.4, 0.6), NormalizeIntrinsics()])
        ]
        loss_name = "robust_mvd_loss"
        lr = 1e-4
        scheduler_name = "flownet_scheduler"
        inputs = None  # engine default: images, poses, intrinsics
    else:  # vis_mvsnet: ImageNet normalization, ABSOLUTE intrinsics,
        # depth_range input (reference: vis_mvsnet.py:189-226)
        augmentations = [
            Compose(
                [
                    NormalizeImagesToMinMax(0.0, 1.0),
                    NormalizeImagesByShiftAndScale(
                        [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]
                    ),
                ]
            )
        ]
        loss_name = "vismvsnet_loss"
        lr = 1e-3
        scheduler_name = "mvsnet_scheduler"
        inputs = ["images", "poses", "intrinsics", "depth_range"]
    dataset = create_dataset(
        "synthetic.train.mvd",
        num_samples=args.num_samples,
        num_views=args.num_views,
        height=args.height,
        width=args.width,
        augmentations=augmentations,
    )
    optimizer = create_optimizer("adam", model=model, lr=lr)
    scheduler = create_scheduler(scheduler_name, optimizer=optimizer)
    loss = create_loss(loss_name, model=model)

    losses = []
    with tempfile.TemporaryDirectory() as out_dir:
        training = MultiViewDepthTraining(
            out_dir=out_dir,
            model=model,
            inputs=inputs,
            dataset=dataset,
            optimizer=optimizer,
            scheduler=scheduler,
            loss=loss,
            batch_size=args.batch_size,
            max_iterations=args.iterations,
            grad_clip_max_norm=5.0,
            print_interval=50,
            log_loss_interval=10**9,
            log_interval=10**9,
            verbose=True,
        )

        orig_step = training._train_step

        def recording_step(state, sample_inputs, sample_gt):
            state, loss_val, sub_losses = orig_step(state, sample_inputs, sample_gt)
            losses.append(loss_val)
            return state, loss_val, sub_losses

        training._train_step = recording_step
        t0 = time.time()
        training()
        wall = time.time() - t0

    losses = [float(jax.device_get(l)) for l in losses]
    n = len(losses)
    first = float(np.mean(losses[: max(1, n // 20)]))
    last = float(np.mean(losses[-max(1, n // 20):]))

    artifact = {
        "what": f"{args.model} training on synthetic data",
        "recipe": {
            "batch_size": args.batch_size,
            "views": f"1+{args.num_views - 1}",
            "size": [args.height, args.width],
            "optimizer": f"adam lr={lr}",
            "scheduler": scheduler_name,
            "grad_clip_max_norm": 5.0,
            "loss": loss_name,
            "dtype": args.dtype,
        },
        "device_kind": device_kind,
        "iterations": n,
        "wall_seconds": round(wall, 2),
        "sec_per_iteration": round(wall / max(n, 1), 4),
        "loss_first_window_mean": first,
        "loss_last_window_mean": last,
        "reduction_factor": round(first / max(last, 1e-9), 3),
        "losses_every_iteration": [round(l, 3) for l in losses],
    }
    os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)

    print(
        f"\n{n} iterations on {device_kind}: loss {first:.1f} -> {last:.1f} "
        f"(x{first / max(last, 1e-9):.2f} reduction), {wall:.1f}s wall "
        f"({wall / max(n, 1) * 1000:.0f} ms/iter). Artifact: {args.out}"
    )
    assert last < 0.6 * first, (
        f"loss did not decrease enough: first-window {first}, last-window {last}"
    )
    print("CONVERGENCE OK")


if __name__ == "__main__":
    main()
