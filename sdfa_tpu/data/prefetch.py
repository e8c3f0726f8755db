"""Multiprocess batch prefetcher.

The reference feeds training from torch DataLoader worker processes
(api.py:45-54, num_workers=cpu/2 — the only multiprocess boundary in its
training stack, SURVEY.md §3.1).  This is the equivalent for our loader:
worker processes run the dataset's __getitem__+collate ahead of the
training step so host feature extraction overlaps device compute.

Design: fork-based workers each own a dataset replica (datasets are
picklable: config + manifest rows; the npz audio cache re-fills per
worker); an index queue fans out batch index lists, a result queue returns
collated numpy batches. Order is not guaranteed (training shuffles anyway).
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
from typing import Iterator, Optional

import numpy as np

from ..utils import log


def _worker(dataset, index_q, result_q, seed: int):
    np.random.seed(seed)
    dataset._rng = np.random.default_rng(seed)
    while True:
        item = index_q.get()
        if item is None:
            break
        batch_id, indices = item
        try:
            batch = dataset.collate([dataset[int(i)] for i in indices])
            result_q.put((batch_id, batch))
        except Exception as exc:  # surface worker errors to the main process
            result_q.put((batch_id, exc))


class PrefetchLoader:
    """Iterable over collated batches produced by worker processes."""

    def __init__(self, dataset, batch_size: int, num_workers: int = 2,
                 shuffle: Optional[bool] = None, drop_last: bool = True,
                 prefetch_batches: int = 4, seed: int = 0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.num_workers = max(int(num_workers), 1)
        self.shuffle = dataset.training if shuffle is None else shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch_batches
        self._epoch = 0
        self._seed = seed

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        ctx = mp.get_context("fork")
        index_q = ctx.Queue()
        result_q = ctx.Queue(maxsize=self.prefetch * self.num_workers)
        workers = [
            ctx.Process(
                target=_worker,
                args=(self.dataset, index_q, result_q,
                      self._seed + self._epoch * 1000 + w),
                daemon=True,
            )
            for w in range(self.num_workers)
        ]
        for w in workers:
            w.start()

        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self._seed + self._epoch).shuffle(order)
        stop = len(order) - (self.batch_size - 1 if self.drop_last else 0)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, max(stop, 0), self.batch_size)
        ]
        self._epoch += 1
        for bid, idx in enumerate(batches):
            index_q.put((bid, idx))
        for _ in workers:
            index_q.put(None)

        received = 0
        try:
            while received < len(batches):
                try:
                    bid, payload = result_q.get(timeout=5.0)
                except queue_mod.Empty:
                    # a forked worker can die without reporting (e.g. fork
                    # while a parent thread held an allocator lock) — fail
                    # loudly instead of blocking forever
                    dead = [w.pid for w in workers if not w.is_alive()]
                    if len(dead) == len(workers):
                        raise RuntimeError(
                            f"all {len(workers)} prefetch workers died "
                            f"(pids {dead}) with {len(batches) - received} "
                            f"batches outstanding"
                        )
                    continue
                received += 1
                if isinstance(payload, Exception):
                    raise RuntimeError(f"prefetch worker failed on batch {bid}") from payload
                yield payload
        finally:
            for w in workers:
                w.terminate()
                w.join(timeout=2)
