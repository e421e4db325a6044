#!/usr/bin/env python3
"""Dataset viewer CLI (reference parity: /root/reference/data_viewer.py).

Same interface as the reference: positional dataset-name-or-eval-output-path,
--layout, --augmentations; plus --export_dir for headless PNG export.
"""

import argparse

from robustmvd_tpu import create_dataset
from robustmvd_tpu.data import list_datasets
from robustmvd_tpu.data.registry import list_augmentations
from robustmvd_tpu.viewer import run_viewer


def data_viewer(args):
    dataset = create_dataset(args.data, augmentations=args.augmentations)

    if args.layout is None:
        layout_names = dataset.get_layout_names()
        eval_layouts = [n for n in layout_names if n.startswith("eval")]
        layout = eval_layouts[0] if eval_layouts else "default"
    else:
        layout = args.layout

    run_viewer(dataset, layout=layout, export_dir=args.export_dir)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "data",
        help="Data to be viewed: a path to evaluation outputs, or a dataset "
        f"name. Available dataset names are: {', '.join(list_datasets())}",
    )
    parser.add_argument(
        "--layout",
        help="Data viewer layout. If not specified, the default layout is used.",
    )
    parser.add_argument(
        "--augmentations",
        nargs="*",
        help=f"Data augmentations. Options are: {', '.join(list_augmentations())}",
    )
    parser.add_argument(
        "--export_dir",
        help="Export PNG pages here instead of opening a window (default when headless).",
    )
    data_viewer(parser.parse_args())
