"""Multi-PROCESS data-parallel train step — run for real, not mocked.

SURVEY.md §5 names multi-host DP (``jax.distributed.initialize`` + a mesh
spanning every process's devices + ``make_array_from_process_local_data``)
as the TPU equivalent of the reference's only parallelism
(/root/reference/saber/trainer/saber_model/data_parallel.py:9). This tool
executes that exact code path on N real OS processes × D virtual CPU
devices each: every process joins one JAX runtime through a local
coordinator, feeds its host-local slice of the global batch through
``parallel.multihost.global_batch_from_local``, and runs ONE jitted train
step over the global mesh. The parent then asserts the multi-process loss
equals the single-process 8-device loss bit-for-bit-close.

Usage (parent — spawns the children):
    python tools/multiproc_train.py --dataset-root /tmp/graft_assets

Child mode (spawned internally):
    python tools/multiproc_train.py --child --process-id K \
        --num-processes N --coordinator localhost:PORT ...
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _bootstrap(devices_per_process: int) -> None:
    """Must run before jax import: virtual CPU devices + cpu platform
    (this image pins jax_platforms to "axon,cpu", so the config must be
    updated explicitly after import — same recipe as tests/conftest.py)."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_process}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def _train_one_step(dataset_root: str, global_batch: int):
    """Build the flagship model and run one sharded train step over ALL
    global devices; returns the (replicated) total loss as a float.

    Identical math to __graft_entry__.dryrun_multichip's train leg — the
    only difference is who owns the devices: here they may span processes,
    and the batch enters through the multihost assembly helper."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdfa_tpu.models import build_model, losses as L
    from sdfa_tpu.parallel import mesh as mesh_lib
    from sdfa_tpu.parallel import multihost as mh
    from sdfa_tpu.tools import configure
    from sdfa_tpu.train.trainer import (
        TrainState, _scaler_names, make_optimizer, make_train_step,
    )

    hp = configure("dgrad", dataset_root=dataset_root)
    model = build_model(hp, load_pca=True)

    rng = jax.random.PRNGKey(0)
    feats0 = jnp.zeros((global_batch, 64, 128, 3), jnp.float32)
    spk0 = jnp.zeros((global_batch,), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, feats0, spk0, False)

    tx, *_ = make_optimizer(hp)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
        opt_state=tx.init(variables["params"]),
        scalers={n: L.ScalerState.init()
                 for n in _scaler_names(model.face_type)},
        step=jnp.zeros((), jnp.int32),
    )

    mesh = mesh_lib.make_mesh(jax.devices())
    state = mesh_lib.replicate(mesh, state)

    # deterministic global batch, identical in every process; each process
    # hands the runtime only its own host-local slice
    gen = np.random.default_rng(0)
    full = {
        "audio_feat": gen.standard_normal(
            (global_batch, 64, 128, 3)).astype(np.float32) * 0.1,
        "speaker_id": np.zeros((global_batch,), np.int32),
        "dgrad_3d_scale": gen.standard_normal(
            (global_batch, 1, 9976, 6)).astype(np.float32) * 0.01,
        "dgrad_3d_rotat": gen.standard_normal(
            (global_batch, 1, 9976, 3)).astype(np.float32) * 0.01,
        "anime_weight": np.ones((global_batch,), np.float32),
    }
    local = mh.local_batch_size(global_batch)
    lo = jax.process_index() * local
    batch = {k: v[lo : lo + local] for k, v in full.items()}
    batch = mh.global_batch_from_local(mesh, batch)

    step_fn = make_train_step(model, hp, tx, donate=False)
    step_args = (state, batch, jax.random.PRNGKey(1),
                 jnp.asarray(1e-4), jnp.asarray(0.9))
    if jax.process_count() > 1:
        # gloo's cross-process context init times out 30 s after the FIRST
        # process reaches the first collective — but each process pays its
        # own multi-minute XLA compile first, and on a loaded host the
        # compile skew alone can exceed 30 s (observed: the r5 dryrun's
        # 2-process leg failing under a concurrent pytest run). Compile
        # ahead of time, then rendezvous at a coordination-service barrier
        # (pure RPC, own long timeout), so every process enters the gloo
        # exchange together.
        compiled = step_fn.lower(*step_args).compile()
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "sdfa_multiproc_precollective", timeout_in_ms=900_000)
        new_state, metrics = compiled(*step_args)
    else:
        new_state, metrics = step_fn(*step_args)
    jax.block_until_ready(new_state.params)
    return float(jax.device_get(metrics["total"]))


def _child(args) -> None:
    _bootstrap(args.devices_per_process)
    import jax

    from sdfa_tpu.parallel import multihost as mh

    if args.num_processes > 1:
        ok = mh.maybe_initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert ok and jax.process_count() == args.num_processes, (
            jax.process_count(), args.num_processes)
    total = _train_one_step(args.dataset_root, args.global_batch)
    print(json.dumps({
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "loss": total,
    }), flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_check(dataset_root: str, num_processes: int = 2,
              devices_per_process: int = 4, global_batch: int = 16,
              timeout: int = 900, oracle: bool = True) -> dict:
    """Spawn the children, plus (optionally) a single-process oracle on
    the same global device count, and assert the losses agree. Returns a
    result dict. ``oracle=False`` skips the extra single-process run and
    only asserts cross-process agreement (used by the multichip dryrun,
    where wall-clock is budgeted; the pytest test keeps the oracle)."""
    port = _free_port()
    base = [sys.executable, os.path.abspath(__file__), "--child",
            "--dataset-root", dataset_root,
            "--num-processes", str(num_processes),
            "--coordinator", f"localhost:{port}",
            "--global-batch", str(global_batch)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            base + ["--process-id", str(k),
                    "--devices-per-process", str(devices_per_process)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO)
        for k in range(num_processes)
    ]
    outs = [p.communicate(timeout=timeout) for p in procs]
    results = []
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (
            f"child rc={p.returncode}\nstdout:\n{out}\nstderr:\n{err[-4000:]}")
        results.append(json.loads(out.strip().splitlines()[-1]))

    losses = [r["loss"] for r in results]
    for r in results:
        assert r["process_count"] == num_processes, r
        assert r["global_devices"] == num_processes * devices_per_process, r
        assert r["local_devices"] == devices_per_process, r
    spread = max(losses) - min(losses)
    assert spread == 0.0, f"processes disagree on the loss: {losses}"
    res = {
        "processes": num_processes,
        "devices_per_process": devices_per_process,
        "global_devices": num_processes * devices_per_process,
        "loss_multiproc": losses[0],
    }
    if not oracle:
        return res

    # single-process oracle: same global batch on the same global device
    # count, classic one-process sharding
    oracle_cmd = [sys.executable, os.path.abspath(__file__), "--child",
                  "--dataset-root", dataset_root,
                  "--num-processes", "1", "--process-id", "0",
                  "--coordinator", "unused",
                  "--global-batch", str(global_batch),
                  "--devices-per-process",
                  str(devices_per_process * num_processes)]
    out = subprocess.run(oracle_cmd, capture_output=True, text=True,
                         env=env, cwd=REPO, timeout=timeout)
    assert out.returncode == 0, out.stderr[-4000:]
    single = json.loads(out.stdout.strip().splitlines()[-1])
    # multi-process vs single-process: same global math, different
    # collective schedule — tiny fp reassociation tolerance
    rel = abs(losses[0] - single["loss"]) / max(abs(single["loss"]), 1e-12)
    assert rel < 1e-5, (losses[0], single["loss"], rel)
    res["loss_single_process"] = single["loss"]
    res["rel_diff_vs_single_process"] = rel
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--dataset-root", required=True)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--coordinator", default="localhost:47531")
    ap.add_argument("--global-batch", type=int, default=16)
    args = ap.parse_args()
    if args.child:
        _child(args)
        return
    res = run_check(args.dataset_root, args.num_processes,
                    args.devices_per_process, args.global_batch)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
