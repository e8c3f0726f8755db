"""Device train-step timing harness.

Shared by bench.py (the realism train-throughput fields) and
tools/qualify_train_kernel.py so the tunnel-sensitive pieces — the
device_get sync barrier (block_until_ready is unreliable over the axon
tunnel, CLAUDE.md) and the windows-count heuristic — have exactly one
copy.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


class StepEnv:
    """One Experiment + one device-resident batch, ready to step."""

    def __init__(self, root: str, log_dir: str,
                 overrides: Optional[dict] = None):
        import jax
        import jax.numpy as jnp

        from ..data import DatasetSlidingWindow
        from ..models import build_model
        from ..tools import configure
        from .trainer import Experiment

        ov = dict(trainer=dict(pca_targets=True))
        if overrides:
            ov.update(overrides)
        hp = configure("dgrad", dataset_root=root, overrides=ov)
        train_set = DatasetSlidingWindow(hp, training=True)
        model = build_model(hp, load_pca=True)
        self.exp = Experiment(hp, model, log_dir=log_dir, training=True)
        bs = int(hp.trainer.anime_loader.batch_size)
        self.batch_host = next(iter(train_set.raw_batches(bs, shuffle=False)))
        self.batch = self.exp.put_batch(self.batch_host)
        self.n_windows = int(max(
            np.shape(v)[0] for v in jax.tree_util.tree_leaves(self.batch_host)
            if np.ndim(v) > 0))
        lr, b1 = self.exp.current_lr(0)
        self.lr = jnp.asarray(lr)
        self.b1 = jnp.asarray(b1)
        self.state = self.exp.state

    def sync(self, metrics) -> None:
        """Completion barrier: device_get is the only trustworthy sync
        over the tunnel; a param slice covers the Adam update too."""
        import jax
        import jax.numpy as jnp

        jax.device_get(metrics)
        _ = np.asarray(jnp.ravel(
            jax.tree_util.tree_leaves(self.state.params)[0])[:1])

    def step(self, step_index: int = 0):
        """One train step on the held batch; returns the metrics dict
        (still on device)."""
        import jax

        rng = jax.random.fold_in(self.exp.rng_base, step_index)
        self.state, metrics = self.exp.train_step_fn(
            self.state, self.batch, rng, self.lr, self.b1)
        return metrics

    def timed_median_s(self, n: int, upload: bool = False) -> float:
        """Median wall seconds/step over n steps (call .step()/.sync()
        once first to absorb the compile)."""
        import jax

        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            if upload:
                self.batch = self.exp.put_batch(self.batch_host)
            metrics = self.step()
            self.sync(metrics)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]
