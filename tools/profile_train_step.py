#!/usr/bin/env python
"""Op-level device profile of one train step (scan vs fused kernels).

Builds the same StepEnv as tools/qualify_train_kernel.py, warms the
compile (persistent-cache hit when qualification ran first), captures a
jax.profiler trace of a few steps, and aggregates the XLA-op plane by
op name so kernel-vs-scan time attribution is a table, not a guess.

    SDFA_PALLAS_LSTM_TRAIN=1 python tools/profile_train_step.py

Env: PROBE_STEPS (default 3), BENCH_TRAIN_ROOT.
"""

import collections
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SDFA_MATMUL_PRECISION", "high")
os.environ.setdefault("SDFA_OPS_PRECISION", "high")


def aggregate_xplane(trace_dir: str):
    """Sum XLA-op durations per op name over every device plane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane under {trace_dir}")
    per_op = collections.Counter()
    total_ps = 0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    per_op[name] += ev.duration_ps
                    total_ps += ev.duration_ps
    return per_op, total_ps


_GROUPS = [
    ("fused-train-fwd", r"bilstm.*fwd|_fwd_kernel|custom.call.*fwd"),
    ("fused-train-bwd", r"bilstm.*bwd|_bwd_kernel"),
    ("pallas/custom-call", r"custom-call|tpu_custom_call"),
    ("while(scan)", r"^while"),
    ("fusion", r"^(loop_)?fusion"),
    ("convolution", r"conv"),
    ("dot", r"dot|einsum"),
    ("copy/transpose", r"copy|transpose|bitcast"),
    ("dynamic-update", r"dynamic"),
    ("all-reduce", r"all-reduce|reduce-scatter|all-gather"),
]


def group_of(name: str) -> str:
    low = name.lower()
    for g, pat in _GROUPS:
        if re.search(pat, low):
            return g
    return "other"


def main():
    flag = os.environ.get("SDFA_PALLAS_LSTM_TRAIN", "0")
    steps = int(os.environ.get("PROBE_STEPS", 3))
    root = os.environ.get("BENCH_TRAIN_ROOT", "/tmp/bench_assets_trained/voca")

    import jax

    from sdfa_tpu.data import synthetic
    from sdfa_tpu.train.stepbench import StepEnv

    if not os.path.exists(os.path.join(root, "train.csv")):
        synthetic.generate(root, "dgrad_3d", speakers=["m0", "f0"],
                           sentences_per_speaker=1, seconds_per_sentence=2.0)

    env = StepEnv(root, log_dir=f"/tmp/profile_train_{flag}")
    env.sync(env.step(0))  # compile (persistent-cache hit after qualify)
    env.sync(env.step(1))

    trace_dir = f"/tmp/sdfa_train_trace_{flag}"
    jax.profiler.start_trace(trace_dir)
    for k in range(steps):
        env.sync(env.step(2 + k))
    jax.profiler.stop_trace()

    per_op, total_ps = aggregate_xplane(trace_dir)
    by_group = collections.Counter()
    for name, ps in per_op.items():
        by_group[group_of(name)] += ps

    ms = lambda ps: round(ps / 1e9 / steps, 2)  # per-step ms
    print(json.dumps({
        "flag": flag,
        "steps": steps,
        "device_ms_per_step": ms(total_ps),
        "groups_ms": {g: ms(v) for g, v in by_group.most_common()},
        "top_ops_ms": {n: ms(v) for n, v in per_op.most_common(25)},
    }), flush=True)


if __name__ == "__main__":
    main()
