"""Prefetching data loader for the numpy host path.

The reference delegates to ``torch.utils.data.DataLoader`` with worker
processes (rmvd/data/dataset.py:219-242). TPU input pipelines are
host-CPU-bound, so this loader keeps samples numpy end-to-end and
overlaps loading with device compute. ``num_workers`` > 0 uses a
fork-based PROCESS pool by default: image decode releases the GIL, but
the augmentation stack (SpatialAugmentation/ColorJitter/Eraser) is pure
numpy Python and serializes on it — measured 1.6 samples/s threaded vs
the 60 samples/s the bf16 train step consumes (tools/bench_loader.py).
``use_processes=False`` restores the thread pool.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

from ..utils import numpy_collate

# fork-inherited handle: set right before the pool forks, so workers read
# the dataset from their copy-on-write memory instead of pickling it
_WORKER_DATASET = None


def _worker_get(idx):
    return _WORKER_DATASET[idx]


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
        use_processes=True,
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
        self.use_processes = use_processes
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

        if self.use_processes:
            try:
                yield from self._iter_prefetch_processes(indices)
                return
            except (ImportError, OSError, ValueError):
                pass  # no fork on this platform: fall back to threads
        yield from self._iter_prefetch(indices)

    def _iter_prefetch_processes(self, indices):
        """Fork-based worker pool with per-sample futures pipelined
        ``prefetch_batches`` ahead; results stream back as numpy pickles."""
        import multiprocessing as mp

        global _WORKER_DATASET
        ctx = mp.get_context("fork")
        batches = list(self._batches(indices))
        _WORKER_DATASET = self.dataset
        try:
            with ProcessPoolExecutor(
                max_workers=self.num_workers, mp_context=ctx
            ) as pool:
                pending = deque()
                batch_iter = iter(batches)

                def submit_next():
                    b = next(batch_iter, None)
                    if b is not None:
                        pending.append(
                            [pool.submit(_worker_get, i) for i in b]
                        )

                for _ in range(self.prefetch_batches + 1):
                    submit_next()
                while pending:
                    futs = pending.popleft()
                    samples = [f.result() for f in futs]
                    submit_next()
                    yield self.collate_fn(samples)
        finally:
            _WORKER_DATASET = None

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
