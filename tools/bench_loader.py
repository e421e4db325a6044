"""Input-pipeline throughput at the paper training recipe.

Measures the threaded DataLoader end-to-end — real PNG decode, the full
robust_mvd StaticThings3D augmentation stack (ColorJitter +
SpatialAugmentation + normalization + Eraser + depth masking) and
collation — at batch 4 with 5 views per sample, against the 60 samples/s
the bf16 train step consumes (BENCH_r04; reference loader:
rmvd/data/dataset.py:219-254).

Builds a synthetic-but-on-disk StaticThings3D raw layout (PNG images at
the real 540x960 resolution, float3 depths/poses/intrinsics) so image
decode cost is real, unlike the in-memory synthetic dataset.

Run: python tools/bench_loader.py [--seqs 6] [--batch 4] [--workers 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def write_raw_st3d(root, n_seqs, rng, H=540, W=960):
    from PIL import Image

    K = np.array(
        [[W * 1.1, 0, W / 2], [0, W * 1.1, H / 2], [0, 0, 1]], np.float32
    )
    for s in range(n_seqs):
        seq = os.path.join(root, "A", f"{s:04d}")
        for sub in ("frames_cleanpass/left", "depths/left", "intrinsics/left", "poses/left"):
            os.makedirs(os.path.join(seq, sub), exist_ok=True)
        for fn in range(6, 6 + 9):
            img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(seq, "frames_cleanpass", "left", f"{fn:04d}.png")
            )
            depth = (rng.rand(H, W) * 30 + 1).astype(np.float32)
            _write_float3(
                os.path.join(seq, "depths", "left", f"{fn:04d}.float3"), depth
            )
            _write_float3(
                os.path.join(seq, "intrinsics", "left", f"{fn:04d}.float3"), K
            )
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = rng.randn(3) * 0.1
            _write_float3(
                os.path.join(seq, "poses", "left", f"{fn:04d}.float3"), pose
            )


def _write_float3(path, arr):
    with open(path, "wb") as f:
        f.write(b"float\n")
        f.write(f"{arr.ndim}\n".encode("ascii"))
        for d in reversed(arr.shape):
            f.write(f"{d}\n".encode("ascii"))
        f.write(arr.astype(np.float32).tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batches", type=int, default=40)
    args = ap.parse_args()

    from robustmvd_tpu.data import create_dataset
    from robustmvd_tpu.data.augmentations import (
        robust_mvd_augmentations_staticthings3d,
    )
    from robustmvd_tpu.data.dataset import _sample_list_path

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as root:
        write_raw_st3d(root, args.seqs, rng)
        cache = _sample_list_path("staticthings3d.robust_mvd.mvd")
        assert not os.path.exists(cache), "stale cached ST3D list in package"
        try:
            ds = create_dataset(
                "staticthings3d.robust_mvd.mvd",
                root=root,
                verbose=False,
                augmentations=[robust_mvd_augmentations_staticthings3d()],
            )
            n = len(ds)
            # warm one sample (decode caches, import costs)
            _ = ds[0]
            for workers in sorted({0, args.workers}):
                t_per_batch = ds.timeit(
                    num_batches=args.batches,
                    batch_size=args.batch,
                    num_workers=workers,
                )
                sps = args.batch / t_per_batch
                print(
                    json.dumps(
                        {
                            "metric": f"loader_samples_per_sec_w{workers}",
                            "value": round(sps, 2),
                            "unit": "samples/s (5 views each, full augs, 540x960 PNG decode)",
                            "batch_size": args.batch,
                            "num_workers": workers,
                            "dataset_len": n,
                            "train_step_demand": 60.2,
                        }
                    ),
                    flush=True,
                )
        finally:
            if os.path.exists(cache):
                os.remove(cache)


if __name__ == "__main__":
    main()
