#!/usr/bin/env python3
"""Inference CLI (reference parity: /root/reference/inference.py).

Runs a model on a folder with key + source views
(key/{image.png,K.npy,to_ref_transform.npy} and source/N/...), writes the
predicted depth as .npy plus turbo-colormapped PNGs.
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

from robustmvd_tpu import create_model
from robustmvd_tpu.models import list_models
from robustmvd_tpu.utils import invert_transform, resize_bilinear
from robustmvd_tpu.utils.platform import add_platform_arg, force_platform
from robustmvd_tpu.utils.vis import vis


def load_data(path):
    """Load the key + source views and rebase poses onto the key view

    (reference: inference.py:18-55)."""
    from PIL import Image

    key_path = osp.join(path, "key")
    src_root = osp.join(path, "source")
    src_paths = sorted(osp.join(src_root, x) for x in os.listdir(src_root))

    image_key = np.array(
        Image.open(osp.join(key_path, "image.png")), dtype=np.float32
    ).transpose(2, 0, 1)
    intrinsics_key = np.load(osp.join(key_path, "K.npy"))
    key_to_ref = np.load(osp.join(key_path, "to_ref_transform.npy"))
    ref_to_key = invert_transform(key_to_ref)
    key_to_key = key_to_ref @ ref_to_key
    h_orig, w_orig = image_key.shape[-2:]

    images, poses, intrinsics = [image_key], [key_to_key], [intrinsics_key]
    for src in src_paths:
        images.append(
            np.array(Image.open(osp.join(src, "image.png")), dtype=np.float32).transpose(2, 0, 1)
        )
        intrinsics.append(np.load(osp.join(src, "K.npy")))
        src_to_ref = np.load(osp.join(src, "to_ref_transform.npy"))
        poses.append(src_to_ref @ ref_to_key)

    sample = {
        "images": images,
        "intrinsics": intrinsics,
        "poses": poses,
        "keyview_idx": 0,
    }
    return sample, h_orig, w_orig


def write_pred(pred, output_path, h_orig, w_orig):
    """(reference: inference.py:58-98)"""
    pred_depth = pred["depth"]  # (1, H, W)
    pred_depth = resize_bilinear(pred_depth, (h_orig, w_orig))[0]

    np.save(osp.join(output_path, "depth.npy"), pred_depth)
    vis(pred_depth).save(osp.join(output_path, "depth.png"))

    with np.errstate(divide="ignore", invalid="ignore"):
        invdepth = np.nan_to_num(1 / pred_depth, nan=0, posinf=0, neginf=0)
    np.save(osp.join(output_path, "invdepth.npy"), invdepth)
    vis(invdepth).save(osp.join(output_path, "invdepth.png"))

    if "depth_uncertainty" in pred:
        unc = resize_bilinear(pred["depth_uncertainty"], (h_orig, w_orig))[0]
        np.save(osp.join(output_path, "depth_uncertainty.npy"), unc)
        vis(unc).save(osp.join(output_path, "depth_uncertainty.png"))


def run(args):
    force_platform(args.platform)
    if args.model is None:
        print(f"No model specified. Available models are: {', '.join(list_models())}")
        return

    print(f"Running inference on data from {args.input_path} with model {args.model}.")
    os.makedirs(args.output_path, exist_ok=True)
    with open(osp.join(args.output_path, "cmd.txt"), "w") as f:
        f.write("python " + " ".join(sys.argv))

    model = create_model(name=args.model, weights=args.weights, train=False, **model_dtype_kwargs(args))
    sample, h_orig, w_orig = load_data(args.input_path)
    pred, _ = model.run(**sample)
    write_pred(pred, args.output_path, h_orig, w_orig)
    print(f"Done. Output written to {args.output_path}.")


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
    parser.add_argument("--input_path", default="sample_data", help="Path to folder with input data.")
    parser.add_argument("--output_path", default="sample_data/out", help="Path to folder for output data.")
    parser.add_argument("--model", help=f"Model. Available: {', '.join(list_models())}")
    parser.add_argument(
        "--dtype",
        default=None,
        choices=["float32", "bfloat16"],
        help="Model compute precision (models that support it). float32 is "
        "the parity default; bfloat16 runs convs/correlation in bf16 with "
        "fp32 accumulation for higher TPU throughput.",
    )
    parser.add_argument("--weights", help="Path to model weights (.pt or .msgpack). Optional.")
    parser.add_argument("--num_gpus", type=int, default=1, help="Accepted for CLI parity; device use is mesh-based.")
    add_platform_arg(parser)
    run(parser.parse_args())
