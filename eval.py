#!/usr/bin/env python3
"""Evaluation CLI (reference parity: /root/reference/eval.py).

Evaluate a model on a single dataset (`--eval_type mvd`) or the 5-dataset
Robust MVD Benchmark (`--eval_type robustmvd`).
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

from robustmvd_tpu import create_dataset, create_evaluation, create_model
from robustmvd_tpu.data import list_datasets
from robustmvd_tpu.eval import list_evaluations
from robustmvd_tpu.models import list_models
from robustmvd_tpu.utils import logging, writer
from robustmvd_tpu.utils.platform import add_platform_arg, force_platform


def set_random_seed(seed):
    import random

    random.seed(seed)
    np.random.seed(seed)


def evaluate(args):
    set_random_seed(args.seed)
    force_platform(args.platform)

    if args.model is None:
        logging.info(f"No model specified. Available models: {', '.join(list_models())}")
        return
    if args.eval_type is None:
        logging.info(
            f"No evaluation type specified. Available: {', '.join(list_evaluations())}"
        )
        return
    if args.eval_type != "robustmvd" and args.dataset is None:
        datasets = list_datasets(dataset_type=args.eval_type, no_dataset_type=True)
        logging.info(f"No dataset specified. Available datasets: {', '.join(datasets)}")
        return

    log_dir = args.log_dir if args.log_dir is not None else args.output
    os.makedirs(args.output, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)
    writer.setup_writers(
        log_tensorboard=not args.no_tensorboard, log_wandb=args.wandb, out_dir=log_dir
    )
    log_file_path = osp.join(args.output, "log.txt")
    logging.add_log_file(log_file_path, flush_line=True)
    with open(osp.join(args.output, "cmd.txt"), "a") as f:
        f.write("python " + " ".join(sys.argv) + "\n")

    if args.eval_type != "robustmvd":
        dataset = create_dataset(
            dataset_name_or_path=args.dataset,
            dataset_type=args.eval_type,
            input_size=args.input_size,
        )
    else:
        dataset = None

    model = create_model(name=args.model, weights=args.weights, train=False, **model_dtype_kwargs(args))
    evaluation = create_evaluation(
        args.eval_type,
        out_dir=args.output,
        inputs=args.inputs,
        alignment=args.alignment,
        view_ordering=args.view_ordering,
        min_source_views=args.min_source_views,
        max_source_views=args.max_source_views,
        eval_uncertainty=args.eval_uncertainty,
    )

    samples = args.num_samples if args.num_samples is not None else args.samples
    qualitatives = (
        args.qualitatives if args.qualitatives is not None else args.num_qualitatives
    )

    evaluation(
        dataset=dataset,
        model=model,
        samples=samples,
        qualitatives=qualitatives,
        eth3d_size=args.eth3d_size,
        kitti_size=args.kitti_size,
        dtu_size=args.dtu_size,
        scannet_size=args.scannet_size,
        tanks_and_temples_size=args.tanks_and_temples_size,
        eval_name=args.eval_name,
        finished_iterations=args.finished_iterations,
    )
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
    parser.add_argument("--model", help=f"Model. Available: {', '.join(list_models())}")
    parser.add_argument(
        "--dtype",
        default=None,
        choices=["float32", "bfloat16"],
        help="Model compute precision (models that support it). float32 is "
        "the parity default; bfloat16 runs convs/correlation in bf16 with "
        "fp32 accumulation for higher TPU throughput.",
    )
    parser.add_argument("--weights", help="Path to model weights. Optional.")
    parser.add_argument("--eval_type", help="mvd | robustmvd")
    parser.add_argument("--dataset", help="Dataset name (for eval_type=mvd).")
    parser.add_argument("--output", default="./eval_out", help="Output directory.")
    parser.add_argument("--log_dir", help="Log directory (defaults to output).")
    parser.add_argument("--inputs", nargs="*", help="Model input modalities.")
    parser.add_argument("--alignment", help="None | median | least_squares_scale_shift")
    parser.add_argument("--view_ordering", default="quasi-optimal")
    parser.add_argument("--min_source_views", type=int, default=1)
    parser.add_argument("--max_source_views", type=int)
    parser.add_argument("--eval_uncertainty", action="store_true", default=True)
    parser.add_argument("--no_eval_uncertainty", dest="eval_uncertainty", action="store_false")
    parser.add_argument("--input_size", type=int, nargs=2, help="(height, width)")
    parser.add_argument("--eth3d_size", type=int, nargs=2, default=None)
    parser.add_argument("--kitti_size", type=int, nargs=2, default=None)
    parser.add_argument("--dtu_size", type=int, nargs=2, default=None)
    parser.add_argument("--scannet_size", type=int, nargs=2, default=None)
    parser.add_argument("--tanks_and_temples_size", type=int, nargs=2, default=None)
    parser.add_argument("--num_samples", type=int, help="Evaluate only N samples.")
    parser.add_argument("--samples", type=int, nargs="*", help="Sample indices.")
    parser.add_argument("--num_qualitatives", type=int, default=10)
    parser.add_argument("--qualitatives", type=int, nargs="*")
    parser.add_argument("--eval_name")
    parser.add_argument("--finished_iterations", type=int)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_gpus", type=int, default=1, help="CLI parity; mesh-based.")
    add_platform_arg(parser)
    parser.add_argument("--no_tensorboard", action="store_true")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--exp_id")
    parser.add_argument("--comment")
    evaluate(parser.parse_args())
