#!/usr/bin/env python3
"""Dataset viewer CLI (reference parity: /root/reference/data_viewer.py)."""

import argparse

from robustmvd_tpu import create_dataset
from robustmvd_tpu.data import list_datasets
from robustmvd_tpu.viewer import run_viewer


def main(args):
    if args.dataset is None:
        print(f"No dataset specified. Available: {', '.join(list_datasets())}")
        return
    dataset = create_dataset(args.dataset)
    layout = None
    eval_layouts = [n for n in dataset.get_layout_names() if n.startswith("eval")]
    if eval_layouts:
        layout = eval_layouts[0]
    run_viewer(dataset, layout=layout, export_dir=args.export_dir)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", help="Dataset name or path to a dataset.cfg.")
    parser.add_argument(
        "--export_dir",
        help="Export PNG pages here instead of opening a window (default when headless).",
    )
    main(parser.parse_args())
