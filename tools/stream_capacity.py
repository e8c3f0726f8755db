#!/usr/bin/env python
"""StreamingServer capacity probe — reproducible version of the round-3
ad-hoc /tmp scripts behind DESIGN.md §12.3's capacity table.

Measures, on the real chip, how many concurrent live streams one device
pipeline carries: N streams each fed a formant-synthesized clip, the
server ticked until every stream is done, aggregate = N·clip_s / wall.

Modes:
  delivered    frames downloaded to the host every tick (the real service
               path; over the axon tunnel this is LINK-bound, ~30 MB/s)
  device-only  dispatch-only ticks, one 1-element download at the end to
               force completion — the device-pipeline capacity a
               PCIe-attached host would see (its link is 25×+ faster
               than the tunnel)

Usage (each N is a fresh timed round over warm jits):
  python tools/stream_capacity.py --n 8 16 32 --clip-s 8 \
      --wire i16 --pipeline --out artifacts/stream_capacity_r3/post_fix.json
  python tools/stream_capacity.py --n 8 32 --device-only ...

Weights: the bench's CI-trained checkpoint when cached
(/tmp/bench_trained_run/last.ckpt), else random init with the shipped
PCA shapes — capacity depends on shapes, not trained values.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("SDFA_MATMUL_PRECISION", "high")
os.environ.setdefault("SDFA_OPS_PRECISION", "high")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sdfa_jax_cache")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402


def _build_task():
    import jax
    import jax.numpy as jnp

    import bench
    from sdfa_tpu.models import build_model
    from sdfa_tpu.task import AnimationTask
    from sdfa_tpu.tools import configure

    ckpt = os.environ.get("BENCH_TRAIN_DIR", "/tmp/bench_trained_run")
    ckpt = os.path.join(ckpt, "last.ckpt")
    root = bench._ensure_pca(os.environ.get(
        "SDFA_CAPACITY_ASSETS", "/tmp/sdfa_capacity_assets"))
    hp = configure("dgrad", dataset_root=root)
    if os.path.exists(ckpt):
        from sdfa_tpu.train import Experiment
        model = build_model(hp, load_pca=True)  # PCA shapes from assets
        exp = Experiment(hp, model, training=False, load_from=ckpt,
                         log_dir="/tmp/sdfa_capacity_state")
        variables = {
            "params": jax.device_get(exp.state.params),
            "batch_stats": jax.device_get(exp.state.batch_stats),
            "constants": jax.device_get(exp.state.constants),
        }
        exp = None
        src = ckpt
    else:
        model = build_model(hp, load_pca=True)
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((2, 64, 128, 3), jnp.float32),
            jnp.zeros((2,), jnp.int32), False)
        src = "random-init"
    task = AnimationTask(hp, model, variables,
                         device_frontend=True, overlap_frontend=True)
    assert task.overlap_frontend
    return hp, task, src


def _clip(hp, seconds: float) -> np.ndarray:
    import bench
    from sdfa_tpu import audio as audio_lib

    sr = int(hp.audio.sample_rate)
    sig = bench._formant_utterance(sr, min(seconds, 3.0))
    sig = audio_lib.rms.normalize(
        sig, hp.dataset_anime.get("audio_target_db", -24.5))
    out = np.zeros(int(seconds * sr), np.float32)
    n = min(len(sig), len(out))
    out[:n] = sig[:n]
    return np.clip(out, -1, 1)


def _drain_device_only(srv):
    """Dispatch-only ticks: never download the vertex batches; force the
    final dependency with a 1-element device slice at the end."""
    last = None
    frames = 0
    while srv.live() and not all(srv.is_done(s) for s in srv.live()):
        pending = srv.tick_dispatch()
        if pending:
            plan, last = pending
            # account frames without the download (no collect happens)
            for sid, slot, batch in plan:
                slot.inflight -= len(batch)
                frames += len(batch)
    if last is not None:
        np.asarray(last[:1, :1])  # force completion (device_get sync)
    return frames


def _run_round(task, hp, n: int, clip_s: float, wire: str, pipeline: bool,
               device_only: bool, emit_batch: int, block_frames: int):
    from sdfa_tpu.streaming import StreamingServer

    sig = _clip(hp, clip_s)
    srv = StreamingServer(task, capacity=n, emit_batch=emit_batch,
                          block_frames=block_frames, wire=wire,
                          pipeline=pipeline and not device_only)
    t0 = time.perf_counter()
    for i in range(n):
        sid = srv.open(i % 8)
        srv.push(sid, sig)
        srv.flush(sid)
    frames = 0
    if device_only:
        frames = _drain_device_only(srv)
    else:
        while not all(srv.is_done(s) for s in srv.live()):
            out = srv.tick()
            frames += sum(len(v) for v in out.values())
        # pipelined: one more tick drains the in-flight round
        out = srv.tick()
        frames += sum(len(v) for v in out.values())
    wall = time.perf_counter() - t0
    for sid in srv.live():
        srv.close(sid)
    return {
        "wall_s": round(wall, 2),
        "per_stream_x_realtime": round(clip_s / wall, 2),
        "aggregate_x_realtime": round(n * clip_s / wall, 2),
        "frames": frames,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[8])
    ap.add_argument("--clip-s", type=float, default=8.0)
    ap.add_argument("--wire", choices=["f32", "i16", "i8d", "coef",
                                       "coef16"], default="i16")
    ap.add_argument("--pipeline", action="store_true", default=True)
    ap.add_argument("--no-pipeline", dest="pipeline", action="store_false")
    ap.add_argument("--device-only", action="store_true")
    ap.add_argument("--emit-batch", type=int, default=16)
    ap.add_argument("--block-frames", type=int, default=16)
    ap.add_argument("--warmup-n", type=int, default=None,
                    help="capacity of the discarded warm-up round "
                    "(default: first --n; shapes must match for jit reuse)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on XLA:CPU (jax_platforms pinned to "
                    "axon,cpu in this image — the env var is ignored)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    hp, task, src = _build_task()
    results = {"config": {
        "clip_s": args.clip_s, "wire": args.wire, "pipeline": args.pipeline,
        "device_only": args.device_only, "emit_batch": args.emit_batch,
        "block_frames": args.block_frames, "weights": src,
    }}
    if args.wire.startswith("coef"):
        # the client decodes its own stream on its own CPU — time it so
        # the coef-wire capacity number carries the client-side cost
        # (LU back-substitution cost is data-independent, random is fine)
        from sdfa_tpu.streaming import CoefDecoder

        dec = CoefDecoder(task)
        batch = np.random.default_rng(0).normal(
            size=(args.emit_batch, dec.n_coefs)).astype(np.float32) * 0.01
        dec.decode(batch)  # warm jitted front + scipy paths
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            dec.decode(batch)
        ms = (time.perf_counter() - t0) / (reps * len(batch)) * 1e3
        dec.decode(batch, precise=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            dec.decode(batch, precise=True)
        ms_precise = (time.perf_counter() - t0) / (reps * len(batch)) * 1e3
        fps = float(task._wspec().fps)
        results["client_decode"] = {
            # fast = fused XLA:CPU front + f64 LU (~1e-7 m vs precise);
            # x_realtime_per_core is the per-CLIENT-core consumption
            # bound: one core decodes this many realtime streams
            "ms_per_frame": round(ms, 3),
            "x_realtime_per_core": round(1e3 / (ms * fps), 2),
            "ms_per_frame_precise_f64": round(ms_precise, 3),
            "emit_batch": args.emit_batch,
            "host_cores": os.cpu_count(),
        }
        print(json.dumps({"client_decode": results["client_decode"]}),
              flush=True)
    for i, n in enumerate(args.n):
        # first round at each N pays that N's batched-ring compile; run a
        # short discarded round first so the timed one is warm
        warm = _run_round(task, hp, n, min(2.0, args.clip_s), args.wire,
                          args.pipeline, args.device_only,
                          args.emit_batch, args.block_frames)
        r = _run_round(task, hp, n, args.clip_s, args.wire, args.pipeline,
                       args.device_only, args.emit_batch, args.block_frames)
        r["cold_wall_s"] = warm["wall_s"]
        results[str(n)] = r
        print(json.dumps({"n": n, **r}), flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
