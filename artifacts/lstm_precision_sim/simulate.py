#!/usr/bin/env python
"""End-to-end error of lowering the fused LSTM kernels' matmul passes.

The fused inference kernels (ops/pallas_freq_lstm.py, ops/pallas_bilstm.py)
accumulate every matmul in f32 via a 3-pass bf16 hi/lo split. Mosaic's
plain f32 dot truncates operands to bf16, so running 1-pass would cut the
recurrence's MXU work to 1/3 — IF the truncation error, amplified through
32 freq steps + 2×64 time steps + attention + PCA decode + the deformation
solve, stays inside the 1e-4 m serving budget.

``_dot_f32(passes<3)`` casts operands to bf16 EXPLICITLY (identical math
on the MXU, faithful in interpret mode), so this simulation runs the FULL
wav→vertices serving path on CPU with the kernels in interpret mode at
SDFA_LSTM_PASSES ∈ {3, 2, 1} and reports max vertex error vs the f32
HIGHEST scan path. passes=2 splits only the weight operand (hi/lo),
activations round to bf16 — splitting the activation side instead
measured barely better than 1-pass (the weight truncation dominates).

    python artifacts/lstm_precision_sim/simulate.py   →  RESULTS.json

Weights: the bench's CI-trained checkpoint when cached
(/tmp/bench_trained_run/last.ckpt), else a deterministic random init —
error scales with weight/activation magnitudes, so results are recorded
with which weights ran.
"""

import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.abspath(os.path.join(_HERE, "..", ".."))
sys.path.insert(0, _ROOT)

LEGS = ("scan", "p3", "p2", "p1")


def _run_leg(leg: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sdfa_tpu.models import build_model
    from sdfa_tpu.task import AnimationTask
    from sdfa_tpu.tools import configure

    sys.path.insert(0, os.path.join(_ROOT, "tests"))
    from _assets import ensure_pca_assets

    hp = configure("dgrad", dataset_root=ensure_pca_assets())
    model = build_model(hp, load_pca=True)

    ckpt = os.path.join(
        os.environ.get("BENCH_TRAIN_DIR", "/tmp/bench_trained_run"),
        "last.ckpt")
    if os.path.exists(ckpt):
        from sdfa_tpu.train import Experiment
        exp = Experiment(hp, model, training=False, load_from=ckpt,
                         log_dir="/tmp/lstm_sim_state")
        variables = {
            "params": jax.device_get(exp.state.params),
            "batch_stats": jax.device_get(exp.state.batch_stats),
            "constants": jax.device_get(exp.state.constants),
        }
        src = "trained:last.ckpt"
    else:
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((2, 64, 128, 3), jnp.float32),
            jnp.zeros((2,), jnp.int32), False)
        src = "random-init"

    if leg != "scan":
        from sdfa_tpu.nn import recurrent
        recurrent._FREQ_FUSED_INTERPRET = True  # fused kernels on CPU

    task = AnimationTask(hp, model, variables,
                         device_frontend=True, overlap_frontend=True)
    assert task.overlap_frontend

    sr = int(hp.audio.sample_rate)
    t = np.arange(int(3.0 * sr)) / sr
    # formant-ish utterance with onsets — exercises the full dynamic range
    sig = (0.3 * np.sin(2 * np.pi * 150 * t)
           * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
           + 0.1 * np.sin(2 * np.pi * 620 * t)
           * np.clip(np.sin(2 * np.pi * 1.7 * t), 0, 1)).astype(np.float32)

    _, verts = task.generate_vertices(sig, 0)
    np.save(os.path.join("/tmp", f"lstm_sim_{leg}.npy"),
            np.asarray(verts, np.float64))
    print(json.dumps({"leg": leg, "weights": src,
                      "frames": int(verts.shape[0])}))


def main() -> None:
    if len(sys.argv) == 3 and sys.argv[1] == "--leg":
        _run_leg(sys.argv[2])
        return

    import numpy as np

    for leg in LEGS:
        env = dict(os.environ)
        env["SDFA_LSTM_PASSES"] = leg[1] if leg.startswith("p") else "3"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", leg],
            env=env, cwd=_ROOT)
        if r.returncode != 0:
            raise RuntimeError(f"leg {leg} failed (rc={r.returncode})")

    oracle = np.load("/tmp/lstm_sim_scan.npy")
    results = {}
    for leg in LEGS[1:]:
        got = np.load(f"/tmp/lstm_sim_{leg}.npy")
        results[leg] = float(np.abs(got - oracle).max())
        print(f"{leg}: max vertex err vs f32 scan = {results[leg]:.3e}")

    out = {
        "max_vertex_err_vs_f32_scan_m": results,
        "budget_m": 1e-4,
        "clip_s": 3.0,
        "note": ("full wav->vertices serving path, fused LSTM kernels in "
                 "interpret mode at SDFA_LSTM_PASSES=3/2/1 vs the f32 "
                 "HIGHEST scan path; p3 isolates the kernels' baseline "
                 "(3-pass + fused-order) error so p2/p1 deltas are "
                 "attributable to the dropped passes"),
    }
    with open(os.path.join(_HERE, "RESULTS.json"), "w") as fp:
        json.dump(out, fp, indent=1)
    print("wrote", os.path.join(_HERE, "RESULTS.json"))


if __name__ == "__main__":
    main()
