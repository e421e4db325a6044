"""Prefetching data loader: ordering, shuffling determinism, batching,

worker-thread path (robustmvd_tpu/data/loader.py)."""

import numpy as np

from robustmvd_tpu.data import create_dataset


def _ds(n=10):
    return create_dataset("synthetic.train.mvd", num_samples=n, num_views=2, height=32, width=32)


def test_loader_batching_and_drop_last():
    ds = _ds(10)
    loader = ds.get_loader(batch_size=4, shuffle=False, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["images"][0].shape[0] == 4

    loader2 = ds.get_loader(batch_size=4, shuffle=False, drop_last=False)
    assert len(list(loader2)) == 3


def test_loader_shuffle_deterministic_by_seed():
    ds = _ds(8)
    names = lambda loader: [b["_name"][0] for b in loader]
    a = names(ds.get_loader(batch_size=1, shuffle=True, seed=7))
    b = names(ds.get_loader(batch_size=1, shuffle=True, seed=7))
    assert a == b
    c = names(ds.get_loader(batch_size=1, shuffle=True, seed=8))
    assert a != c


def test_loader_threaded_prefetch_matches_sync():
    ds = _ds(6)
    sync = [b["_name"] for b in ds.get_loader(batch_size=2, num_workers=0)]
    threaded = [b["_name"] for b in ds.get_loader(batch_size=2, num_workers=3)]
    assert sync == threaded


def test_timeit_runs():
    ds = _ds(4)
    per_batch = ds.timeit(num_batches=3, batch_size=2)
    assert per_batch > 0
