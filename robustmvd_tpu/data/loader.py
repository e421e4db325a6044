"""Prefetching data loader for the numpy host path.

The reference delegates to ``torch.utils.data.DataLoader`` with worker
processes (rmvd/data/dataset.py:219-242). TPU input pipelines are
host-CPU-bound, so this loader keeps samples numpy end-to-end and overlaps
loading with device compute via a background thread pool that prefetches
batches into a bounded queue. ``num_workers`` threads load samples
concurrently (image decode and file IO release the GIL).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..utils import numpy_collate


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size=1,
        shuffle=False,
        num_workers=0,
        collate_fn=None,
        drop_last=False,
        indices=None,
        seed=None,
        prefetch_batches=2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.collate_fn = collate_fn or numpy_collate
        self.drop_last = drop_last
        self.indices = list(indices) if indices is not None else None
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self._epoch = 0

    def __len__(self):
        n = len(self.indices) if self.indices is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self):
        indices = self.indices if self.indices is not None else list(range(len(self.dataset)))
        if self.shuffle:
            rng = np.random.RandomState(
                None if self.seed is None else self.seed + self._epoch
            )
            indices = list(indices)
            rng.shuffle(indices)
        return indices

    def _batches(self, indices):
        for i in range(0, len(indices), self.batch_size):
            batch = indices[i : i + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                return
            yield batch

    def __iter__(self):
        indices = self._index_order()
        self._epoch += 1

        if self.num_workers <= 0:
            for batch_idx in self._batches(indices):
                yield self.collate_fn([self.dataset[i] for i in batch_idx])
            return

        yield from self._iter_prefetch(indices)

    def _iter_prefetch(self, indices):
        batches = list(self._batches(indices))
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    out_q.put(self.collate_fn(samples))
            out_q.put(_END)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is _END:
                    return
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while not out_q.empty():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


_END = object()
