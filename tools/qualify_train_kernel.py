#!/usr/bin/env python
"""Hardware qualification: fused biLSTM training core vs the scan path.

Builds the SAME Experiment twice (identical seeds → identical init) with
SDFA_PALLAS_LSTM_TRAIN=0/1, then measures device-resident train-step time
and checks the 5-step loss trajectory + parameter agreement between the
paths. Prints one JSON line; run on the real chip:

    python tools/qualify_train_kernel.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SDFA_MATMUL_PRECISION", "high")
os.environ.setdefault("SDFA_OPS_PRECISION", "high")

import numpy as np


def build_and_run(flag: str, root: str,
                  n_timed: int = int(os.environ.get("QUAL_ITERS", 10))):
    import jax
    import jax.numpy as jnp

    from sdfa_tpu.data import DatasetSlidingWindow
    from sdfa_tpu.models import build_model
    from sdfa_tpu.tools import configure
    from sdfa_tpu.train import Experiment

    os.environ["SDFA_PALLAS_LSTM_TRAIN"] = flag
    hp = configure("dgrad", dataset_root=root,
                   overrides=dict(trainer=dict(pca_targets=True)))
    train_set = DatasetSlidingWindow(hp, training=True)
    model = build_model(hp, load_pca=True)
    exp = Experiment(hp, model, log_dir=f"/tmp/qual_train_{flag}",
                     training=True)
    bs = int(hp.trainer.anime_loader.batch_size)
    batch = exp.put_batch(next(iter(train_set.raw_batches(bs, shuffle=False))))
    n_windows = max(np.shape(v)[0] for v in jax.tree_util.tree_leaves(batch)
                    if hasattr(v, "ndim") and v.ndim > 0)
    lr, b1 = exp.current_lr(0)
    lr = jnp.asarray(lr)
    b1 = jnp.asarray(b1)

    def sync(state, metrics):
        jax.device_get(metrics)
        _ = np.asarray(jnp.ravel(
            jax.tree_util.tree_leaves(state.params)[0])[:1])

    # parity leg: 5 deterministic steps from the seeded init
    state = exp.state
    losses = []
    for k in range(5):
        rng = jax.random.fold_in(exp.rng_base, k)
        state, metrics = exp.train_step_fn(state, batch, rng, lr, b1)
        vals = jax.device_get(metrics)
        losses.append(float(sum(
            v for k, v in vals.items()
            if k.startswith("loss") or k.startswith("dyn_"))))
    probe = np.asarray(jnp.ravel(
        jax.tree_util.tree_leaves(state.params)[0])[:64])

    # timing leg (warm: the 5 steps above compiled everything)
    rng = jax.random.fold_in(exp.rng_base, 0)
    ts = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        state, metrics = exp.train_step_fn(state, batch, rng, lr, b1)
        sync(state, metrics)
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    return {
        "ms_per_step": round(dt * 1e3, 1),
        "windows_per_s": round(n_windows / dt, 1),
        "losses": [round(x, 6) for x in losses],
        "probe": probe,
        "n_windows": int(n_windows),
    }


def main():
    from sdfa_tpu.data import synthetic

    root = os.environ.get("BENCH_TRAIN_ROOT", "/tmp/bench_assets_trained/voca")
    if not os.path.exists(os.path.join(root, "train.csv")):
        synthetic.generate(root, "dgrad_3d", speakers=["m0", "f0"],
                           sentences_per_speaker=1, seconds_per_sentence=2.0)

    scan = build_and_run("0", root)
    fused = build_and_run("1", root)

    loss_delta = max(abs(a - b) / (abs(a) + 1e-12)
                     for a, b in zip(scan["losses"], fused["losses"]))
    probe_delta = float(np.max(np.abs(scan["probe"] - fused["probe"])))
    out = {
        "metric": "train_step_fused_vs_scan",
        "scan_ms": scan["ms_per_step"],
        "fused_ms": fused["ms_per_step"],
        "speedup": round(scan["ms_per_step"] / fused["ms_per_step"], 3),
        "scan_windows_per_s": scan["windows_per_s"],
        "fused_windows_per_s": fused["windows_per_s"],
        "n_windows": scan["n_windows"],
        "loss_rel_delta_5steps": loss_delta,
        "param_probe_abs_delta": probe_delta,
        "losses_scan": scan["losses"],
        "losses_fused": fused["losses"],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
