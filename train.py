#!/usr/bin/env python3
"""Training CLI (reference parity: /root/reference/train.py).

Reference recipe for robust_mvd (train_all.sh:49): batch 4, 600k iters,
adam lr 1e-4, grad clip 5, flownet_scheduler, robust_mvd_loss,
staticthings3d.robust_mvd.mvd + blendedmvs.robust_mvd.mvd, seed 42.
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

from robustmvd_tpu import (
    create_compound_dataset,
    create_dataset,
    create_loss,
    create_model,
    create_optimizer,
    create_scheduler,
    create_training,
)
from robustmvd_tpu.data import list_datasets
from robustmvd_tpu.loss import list_losses
from robustmvd_tpu.models import list_models
from robustmvd_tpu.optim import list_optimizers, list_schedulers
from robustmvd_tpu.train import list_trainings
from robustmvd_tpu.utils import logging, writer
from robustmvd_tpu.utils.platform import add_platform_arg, force_platform


def set_random_seed(seed):
    import random

    random.seed(seed)
    np.random.seed(seed)


def train(args):
    # multi-host: launch.py runs this same command on each host with the
    # RMVD_TPU_COORDINATOR / RMVD_TPU_NUM_PROCESSES / RMVD_TPU_PROCESS_ID
    # contract exported (or RMVD_TPU_DIST_AUTO=1 on autodetecting pods).
    # MUST run before anything touches the backend (set_random_seed /
    # create_model initialize XLA) — jax.distributed.initialize refuses
    # to run after backend init.
    from robustmvd_tpu.parallel.mesh import init_distributed_from_env

    init_distributed_from_env()

    set_random_seed(args.seed)
    force_platform(args.platform)

    if args.model is None:
        logging.info(
            f"No model specified. Available: {', '.join(list_models(trainable_only=True))}"
        )
        return
    if args.training_type is None:
        logging.info(f"No training type specified. Available: {', '.join(list_trainings())}")
        return
    if args.augmentations is not None and args.augmentations_per_dataset is not None:
        logging.info("Error: --augmentations and --augmentations_per_dataset conflict.")
        return
    if args.augmentations_per_dataset is not None and len(
        args.augmentations_per_dataset
    ) != len(args.dataset):
        logging.info("Error: need one --augmentations_per_dataset per --dataset.")
        return
    if args.dataset is None:
        logging.info(f"No dataset specified. Available: {', '.join(list_datasets())}")
        return
    if args.optimizer is None:
        logging.info(f"No optimizer specified. Available: {', '.join(list_optimizers())}")
        return
    if args.scheduler is None:
        logging.info(f"No scheduler specified. Available: {', '.join(list_schedulers())}")
        return
    if args.loss is None:
        logging.info(f"No loss specified. Available: {', '.join(list_losses())}")
        return

    out_dir = args.output
    os.makedirs(out_dir, exist_ok=True)
    writer.setup_writers(
        log_tensorboard=not args.no_tensorboard, log_wandb=args.wandb, out_dir=out_dir
    )
    log_file_path = osp.join(out_dir, "log.txt")
    logging.add_log_file(log_file_path, flush_line=True)
    with open(osp.join(out_dir, "cmd.txt"), "a") as f:
        f.write("python " + " ".join(sys.argv) + "\n")

    datasets = []
    for dataset_idx, dataset_name in enumerate(args.dataset):
        augmentation = (
            args.augmentations_per_dataset[dataset_idx]
            if args.augmentations_per_dataset is not None
            else args.augmentations
        )
        datasets.append(
            create_dataset(
                dataset_name_or_path=dataset_name,
                input_size=args.input_size,
                target_size=args.target_size,
                augmentations=augmentation,
            )
        )
    dataset = datasets[0] if len(datasets) == 1 else create_compound_dataset(datasets)

    model = create_model(name=args.model, pretrained=False, weights=args.weights, train=True, **model_dtype_kwargs(args))
    optimizer = create_optimizer(name=args.optimizer, model=model, lr=args.lr)
    scheduler = create_scheduler(name=args.scheduler, optimizer=optimizer)
    loss = create_loss(name=args.loss, model=model)

    mesh = None
    if args.data_parallel:
        from robustmvd_tpu.parallel import MeshSpec, make_mesh

        mesh = make_mesh(MeshSpec())

    training = create_training(
        training_type=args.training_type,
        out_dir=out_dir,
        model=model,
        dataset=dataset,
        optimizer=optimizer,
        scheduler=scheduler,
        loss=loss,
        batch_size=args.batch_size,
        max_iterations=args.max_iterations,
        inputs=args.inputs,
        batch_augmentations=args.batch_augmentations,
        grad_clip_max_norm=args.grad_clip_max_norm,
        num_workers=args.num_workers,
        log_interval=args.log_interval,
        mesh=mesh,
        verbose=True,
    )
    training()
    logging.remove_log_file(log_file_path)


def model_dtype_kwargs(args):
    """CLI model options -> create_model kwargs (shared gate in models.factory)."""
    from robustmvd_tpu.models import cli_model_kwargs

    return cli_model_kwargs(
        getattr(args, "model", ""),
        dtype=getattr(args, "dtype", None) or None,
        no_remat=getattr(args, "no_remat", False),
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", help="Model to train.")
    parser.add_argument(
        "--dtype",
        default=None,
        choices=["float32", "bfloat16"],
        help="Model compute precision (models that support it). float32 is "
        "the parity default; bfloat16 runs convs/correlation in bf16 with "
        "fp32 accumulation for higher TPU throughput.",
    )
    parser.add_argument("--weights", help="Initial weights. Optional.")
    parser.add_argument("--training_type", default="mvd")
    parser.add_argument("--dataset", nargs="*", help="Training dataset(s).")
    parser.add_argument("--augmentations", nargs="*")
    parser.add_argument("--augmentations_per_dataset", nargs="*")
    parser.add_argument("--batch_augmentations", nargs="*")
    parser.add_argument("--inputs", nargs="*")
    parser.add_argument("--input_size", type=int, nargs=2)
    parser.add_argument("--target_size", type=int, nargs=2)
    parser.add_argument("--output", default="./train_out")
    parser.add_argument("--optimizer", default="adam")
    parser.add_argument("--scheduler", default="flownet_scheduler")
    parser.add_argument("--loss")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--max_iterations", type=int, default=600000)
    parser.add_argument("--grad_clip_max_norm", type=float)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--log_interval", type=int, default=5000)
    parser.add_argument("--log_full_batch", action="store_true")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_gpus", type=int, default=1, help="CLI parity; mesh-based.")
    add_platform_arg(parser)
    parser.add_argument("--data_parallel", action="store_true", help="Shard batch over all devices.")
    parser.add_argument("--no_remat", action="store_true", help="Disable activation rematerialization (faster, more memory; fits the paper recipe on one chip).")
    parser.add_argument("--no_tensorboard", action="store_true")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--exp_id")
    parser.add_argument("--comment")
    train(parser.parse_args())
