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

    def step(self, step_index: int = 0, batch=None):
        """One train step on the held batch (or a given device batch);
        returns the metrics dict (still on device)."""
        import jax

        rng = jax.random.fold_in(self.exp.rng_base, step_index)
        self.state, metrics = self.exp.train_step_fn(
            self.state, batch if batch is not None else self.batch,
            rng, self.lr, self.b1)
        return metrics

    def timed_median_s(self, n: int, upload: bool = False) -> float:
        """Median wall seconds/step over n steps, SYNCED every step (call
        .step()/.sync() once first to absorb the compile). Includes one
        dispatch round-trip per step — the tunnel-pessimal pattern."""
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

    def timed_steady_s(self, n: int, upload: bool = False) -> float:
        """Steady-state wall seconds/step over n back-to-back steps with
        ONE sync at the end — the Trainer's actual loop shape (it syncs
        every ~50 steps, not every step). ``upload=True`` double-buffers
        the host→device batch transfer exactly like
        Trainer._fetch_put: batch k+1's device_put is dispatched behind
        step k's async dispatch, so the copy rides under device compute
        (VERDICT r4 #4)."""
        metrics = None
        nxt = self.exp.put_batch(self.batch_host) if upload else self.batch
        t0 = time.perf_counter()
        for i in range(n):
            cur = nxt
            metrics = self.step(i, batch=cur)
            if upload:
                nxt = self.exp.put_batch(self.batch_host)
        self.sync(metrics)
        return (time.perf_counter() - t0) / n

    def cost_stats(self) -> dict:
        """XLA flops/bytes estimates for ONE compiled train step on the
        held shapes (the serving bench's roofline accounting, applied to
        training — VERDICT r4 #4 'nobody can say its MFU')."""
        import jax

        lowered = self.exp.train_step_fn.lower(
            self.state, self.batch, jax.random.PRNGKey(0), self.lr, self.b1)
        costs = lowered.compile().cost_analysis()
        if isinstance(costs, (list, tuple)):
            costs = costs[0]
        costs = dict(costs or {})
        return {
            "flops": float(costs.get("flops", 0.0)),
            "bytes": float(costs.get("bytes accessed", 0.0)),
        }
