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

    from sdfa_tpu.train.stepbench import StepEnv

    os.environ["SDFA_PALLAS_LSTM_TRAIN"] = flag
    env = StepEnv(root, log_dir=f"/tmp/qual_train_{flag}")

    # parity leg: 5 deterministic steps from the seeded init
    losses = []
    for k in range(5):
        vals = jax.device_get(env.step(k))
        losses.append(float(sum(
            v for key, v in vals.items()
            if key.startswith("loss") or key.startswith("dyn_"))))
    probe = np.asarray(jnp.ravel(
        jax.tree_util.tree_leaves(env.state.params)[0])[:64])

    # timing leg (warm: the 5 steps above compiled everything)
    dt = env.timed_median_s(n_timed)
    return {
        "ms_per_step": round(dt * 1e3, 1),
        "windows_per_s": round(env.n_windows / dt, 1),
        "losses": [round(x, 6) for x in losses],
        "probe": probe,
        "n_windows": env.n_windows,
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
