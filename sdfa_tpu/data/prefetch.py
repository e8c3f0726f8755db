"""Multiprocess batch prefetcher.

The reference feeds training from torch DataLoader worker processes
(api.py:45-54, num_workers=cpu/2 — the only multiprocess boundary in its
training stack, SURVEY.md §3.1).  This is the equivalent for our loader:
worker processes run the dataset's __getitem__+collate ahead of the
training step so host feature extraction overlaps device compute.

Design: spawn-based workers each own a dataset replica (datasets are
picklable: config + manifest rows; the npz audio cache re-fills per
worker); an index queue fans out batch index lists, a result queue returns
collated numpy batches. Order is not guaranteed (training shuffles anyway).

Why forkserver, not fork: the training process runs JAX, which is
multithreaded by the time the loader starts — fork() of a multithreaded
process can deadlock a child on an allocator/runtime lock (Python itself
warns), and a forked child that dies this way reports nothing. The
forkserver's server process is started FRESH (no JAX, no threads) and
workers fork from it, so neither the deadlock hazard nor spawn's
re-import-of-__main__ requirement (the `if __name__ == "__main__"` guard)
applies to the server. Worker *preparation* still imports the parent's
``__main__`` (CPython runs ``spawn._main`` for forkserver workers too),
so — exactly like torch's DataLoader — entry scripts must guard loader
iteration with ``if __name__ == "__main__":``; the all-workers-died
error names this remedy. Datasets defined interactively in ``__main__``
can't be unpickled by a forkserver worker — those fall back to fork
workers with a warning, as does ``SDFA_PREFETCH_MP=fork``. Worker exceptions travel back as a (traceback text, repr)
payload so the main process can re-raise with the REAL failure site — a
pickled exception alone loses its remote traceback.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue as queue_mod
import traceback
from typing import Iterator, Optional

import numpy as np

from ..utils import log


class _WorkerFailure:
    """Picklable carrier for a worker-side exception + its traceback text."""

    def __init__(self, exc: BaseException):
        self.exc_repr = repr(exc)
        self.tb_text = traceback.format_exc()


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
            result_q.put((batch_id, _WorkerFailure(exc)))


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

    def _mp_method(self) -> str:
        """``forkserver`` unless overridden or the dataset itself lives in
        ``__main__`` (then only fork can reach its class)."""
        forced = os.environ.get("SDFA_PREFETCH_MP")
        if forced:
            return forced
        if type(self.dataset).__module__ == "__main__":
            log.warn("prefetch: dataset class is defined in __main__ and "
                     "cannot be unpickled by a forkserver worker; falling "
                     "back to fork workers")
            return "fork"
        return "forkserver"

    def __iter__(self) -> Iterator[dict]:
        ctx = mp.get_context(self._mp_method())
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
        empty_after_exit = 0
        try:
            while received < len(batches):
                try:
                    bid, payload = result_q.get(timeout=5.0)
                except queue_mod.Empty:
                    # a worker can die without reporting (OOM-kill, _exit)
                    # — fail loudly instead of blocking forever. Workers
                    # that finished all their index-queue work exit CLEANLY
                    # (exitcode 0) while their results may still be in the
                    # queue's feeder pipe on a loaded host, so a clean exit
                    # is NOT death (the round-3 full-suite flake was this
                    # false positive); only nonzero exitcodes are.
                    exited = [w for w in workers if not w.is_alive()]
                    abnormal = [w.pid for w in exited
                                if w.exitcode not in (0, None)]
                    if len(abnormal) == len(workers):
                        raise RuntimeError(
                            f"all {len(workers)} prefetch workers died "
                            f"(pids {abnormal}) with {len(batches) - received} "
                            f"batches outstanding. If they died at startup, "
                            f"the usual cause is an entry script without the "
                            f"`if __name__ == '__main__':` guard that "
                            f"spawn/forkserver workers require (see the "
                            f"worker stderr above); SDFA_PREFETCH_MP=fork "
                            f"restores fork workers."
                        )
                    if len(exited) == len(workers):
                        # all exited (some cleanly) but batches are still
                        # outstanding: give the feeder pipes a generous
                        # grace window before declaring the data lost
                        empty_after_exit += 1
                        if empty_after_exit >= 6:  # ≥30 s of silence
                            raise RuntimeError(
                                f"all prefetch workers exited but "
                                f"{len(batches) - received} batches never "
                                f"arrived (abnormal exits: {abnormal or None})"
                            )
                    continue
                empty_after_exit = 0
                received += 1
                if isinstance(payload, _WorkerFailure):
                    raise RuntimeError(
                        f"prefetch worker failed on batch {bid}: "
                        f"{payload.exc_repr}\n--- worker traceback ---\n"
                        f"{payload.tb_text}"
                    )
                yield payload
        finally:
            for w in workers:
                w.terminate()
                w.join(timeout=2)
