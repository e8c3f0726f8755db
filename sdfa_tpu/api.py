"""Top-level API: train / evaluate / trace.

Reference: /root/reference/speech_anime/api.py:12-197.
- train_model: configure → log dir → datasets → model → Experiment → Trainer
- evaluate_model: configure → restore → AnimationTask.evaluate
- trace_model: AOT-compile + serialize the forward (the torch.jit.trace
  equivalent is jax.jit lowering/AOT; the compiled artifact is cached and a
  msgpack of the inference variables is exported).
"""

from __future__ import annotations

import datetime
import os
from typing import Optional

import jax
import numpy as np

from .data import DatasetSlidingWindow
from .models import build_model
from .task import AnimationTask
from .tools import configure
from .train import Experiment, Trainer, checkpoints as ckpt_io
from .utils import ArgumentParser, log
from .utils.filesystem import maybe_in_dirs


def _resolve_log_dir(hp, log_dir: Optional[str], tag_suffix: str = ""):
    if log_dir:
        return log_dir
    date = datetime.datetime.now().strftime("%Y%m%d")
    tag = hp.get("tag", "run") + tag_suffix
    return os.path.join("experiments", "results", f"[{date}]{tag}")


def train_model(
    custom_hparams: Optional[str] = None,
    log_dir: Optional[str] = None,
    load_from: Optional[str] = None,
    dataset_root: Optional[str] = None,
    overrides: Optional[dict] = None,
    max_steps: Optional[int] = None,
):
    hp = configure(custom_hparams, overrides=overrides, dataset_root=dataset_root)
    log_dir = _resolve_log_dir(hp, log_dir)
    load_path = maybe_in_dirs(
        load_from, possible_roots=[log_dir], possible_exts=[".ckpt"]
    ) if load_from else None

    train_set = DatasetSlidingWindow(hp, training=True)
    valid_set = DatasetSlidingWindow(hp, training=False)
    log.info(f"train windows: {len(train_set)}, valid windows: {len(valid_set)}")

    model = build_model(hp, load_pca=True)
    exp = Experiment(hp, model, log_dir=log_dir, training=True, load_from=load_path)

    bs = int(hp.trainer.anime_loader.batch_size)
    # the collated batch is 2·bs (adjacent-frame doubling) and must divide
    # the device mesh; round bs up so sharding is even (e.g. 50 → 52 on 8)
    n_dev = jax.device_count()
    if (2 * bs) % n_dev:
        bs = ((2 * bs + n_dev - 1) // n_dev * n_dev + 1) // 2
        if (2 * bs) % n_dev:
            bs = ((2 * bs) // n_dev + 1) * n_dev // 2
        log.info(f"batch_size rounded to {bs} for even sharding over {n_dev} devices")

    # raw mode (default): host ships raw windows + augmentation knobs, the
    # mel pipeline runs on device (data/device_features.py) — ~10× cheaper
    # host prep on this single-CPU image; set trainer.host_features=true to
    # use the bit-exact host feature path instead
    raw_mode = not bool(hp.trainer.get("host_features", False))
    batches_fn = (lambda ds, **kw: ds.raw_batches(bs, **kw)) if raw_mode else (
        lambda ds, **kw: ds.batches(bs, **kw))

    if raw_mode:
        # the device feature kernel supports the shipped augmentation set;
        # options it does not implement must fail loudly, not silently
        # train without them (ADVICE r1)
        fc = hp.audio.feature
        for opt in ("random_mel_noise", "random_mel_tremolo"):
            if fc.get(opt):
                raise NotImplementedError(
                    f"audio.feature.{opt} is not implemented in raw mode "
                    "(device features) — set trainer.host_features=true")
        if hp.trainer.anime_loader.get("multiple_workers"):
            log.warn("raw mode ignores anime_loader.multiple_workers "
                     "(device frontend needs no worker pool); set "
                     "trainer.host_features=true to use PrefetchLoader")

    multiple_workers = bool(hp.trainer.anime_loader.get("multiple_workers", False))
    if multiple_workers and max_steps is None and not raw_mode:
        from .data.prefetch import PrefetchLoader

        n_workers = max((os.cpu_count() or 2) // 2, 1)
        train_loader = PrefetchLoader(train_set, bs, num_workers=n_workers)
        valid_loader = PrefetchLoader(valid_set, bs, num_workers=max(n_workers // 2, 1),
                                      shuffle=False)
    else:
        steps_done = {"n": 0}  # max_steps caps the whole run, not per epoch

        def _train_gen():
            it = batches_fn(train_set)
            for b in it:
                if max_steps is not None and steps_done["n"] >= max_steps:
                    break
                steps_done["n"] += 1
                yield b

        class _Loader:
            def __init__(self, fn):
                self.fn = fn

            def __iter__(self):
                return self.fn()

        train_loader = _Loader(_train_gen)
        valid_loader = _Loader(lambda: batches_fn(valid_set, shuffle=False))
        if raw_mode and hp.trainer.get("thread_prefetch", True):
            # overlap the ~0.2 s/batch numpy window prep with the device
            # step: a daemon thread keeps 2 batches ready (no fork-under-
            # JAX hazard — threads, not processes; data/thread_prefetch.py)
            from .data.thread_prefetch import ThreadPrefetchIterable

            train_loader = ThreadPrefetchIterable(train_loader)
            valid_loader = ThreadPrefetchIterable(valid_loader)

    trainer = Trainer(exp, train_loader=train_loader, valid_loader=valid_loader)
    trainer.train()
    return exp


def evaluate_model(
    custom_hparams: Optional[str] = None,
    load_from: Optional[str] = None,
    eval_input: Optional[str] = None,
    eval_spk_cond: Optional[str] = None,
    output_dir: Optional[str] = None,
    dataset_root: Optional[str] = None,
    overrides: Optional[dict] = None,
    **eval_kwargs,
):
    hp = configure(custom_hparams, overrides=overrides, dataset_root=dataset_root)
    if eval_input is not None:
        hp.trainer.evaluate.set_key(
            "test", [(eval_input, f"speaker={eval_spk_cond or 'm1'}")]
        )

    model = build_model(hp, load_pca=False)
    # keep Experiment bookkeeping out of the eval artifact dir
    state_dir = os.path.join(output_dir or "evaluate_results", "_state")
    exp = Experiment(hp, model, log_dir=state_dir,
                     training=False, load_from=load_from)
    variables = {
        "params": jax.device_get(exp.state.params),
        "batch_stats": jax.device_get(exp.state.batch_stats),
        "constants": jax.device_get(exp.state.constants),
    }
    task = AnimationTask(hp, model, variables)
    sources = [ArgumentParser(*args) for args in hp.trainer.evaluate.test]
    return task.evaluate(sources, output_dir=output_dir or "evaluate_results", **eval_kwargs)


def trace_model(
    custom_hparams: Optional[str] = None,
    load_from: Optional[str] = None,
    traced_dump_path: Optional[str] = None,
    dataset_root: Optional[str] = None,
    overrides: Optional[dict] = None,
):
    """AOT-lower and compile the inference forward; dump compiler stats and
    the serialized inference variables (api.py:136-167 equivalent)."""
    import flax.serialization as fser
    import jax.numpy as jnp

    hp = configure(custom_hparams, overrides=overrides, dataset_root=dataset_root)
    model = build_model(hp, load_pca=load_from is None)
    exp = Experiment(hp, model, log_dir="/tmp/sdfa_trace_state",
                     training=False, load_from=load_from)
    variables = {
        "params": jax.device_get(exp.state.params),
        "batch_stats": jax.device_get(exp.state.batch_stats),
        "constants": jax.device_get(exp.state.constants),
    }

    def fwd(variables, feats, spk):
        preds, z, _ = model.apply(variables, feats, spk, False)
        return model.decode_to_anime(variables, preds)

    frames = int(hp.audio.feature.sliding_window_frames)
    n_mels = int(hp.audio.mel.n_mels)
    example = (
        variables,
        jnp.zeros((1, frames, n_mels, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )
    lowered = jax.jit(fwd).lower(*example)
    compiled = lowered.compile()
    out = traced_dump_path or "traced_model"
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "model.msgpack"), "wb") as fp:
        fp.write(fser.to_bytes(variables))
    with open(os.path.join(out, "hlo.txt"), "w") as fp:
        fp.write(lowered.as_text())
    with open(os.path.join(out, "compile_info.txt"), "w") as fp:
        fp.write(str(compiled.cost_analysis()))
    hp.dump(os.path.join(out, "hparams.json"))
    log.info(f"traced artifacts dumped to {out}")
    return compiled


def load_task(ckpt_path: str, custom_hparams: Optional[str] = None,
              dataset_root: Optional[str] = None,
              overrides: Optional[dict] = None, **task_kwargs) -> AnimationTask:
    """Checkpoint → inference-ready AnimationTask.

    Hparams come from the run dir's ``hparams.json`` (written next to
    every checkpoint by Experiment) unless ``custom_hparams`` is given.
    The serving counterpart of the reference's evaluate flow
    (speech_anime/api.py:108-129) without the eval-source machinery."""
    import flax.serialization as fser

    from .utils.config import ConfigDict

    run_dir = os.path.dirname(os.path.abspath(ckpt_path))
    hp_json = os.path.join(run_dir, "hparams.json")
    if custom_hparams is not None:
        hp = configure(custom_hparams, overrides=overrides,
                       dataset_root=dataset_root)
    elif os.path.exists(hp_json):
        hp = ConfigDict.parse_file(hp_json)
        if dataset_root is not None:
            hp.dataset_anime.set_key("root", dataset_root)
        if overrides:
            hp.overwrite_by(overrides)
    else:
        raise FileNotFoundError(
            f"no hparams.json next to {ckpt_path} — pass custom_hparams "
            "(the default config would build a model unrelated to this "
            "checkpoint)")
    model = build_model(hp, load_pca=False)
    if _is_torch_checkpoint(ckpt_path):
        # a checkpoint written by the REFERENCE framework (torch pickle,
        # saber/trainer/manager/checkpoints.py:50-64 schema, possibly with
        # the legacy module names of the published pretrained models) —
        # ingest through the compat layer
        from .compat.torch_ckpt import convert_state_dict, load_torch_checkpoint

        state, meta = load_torch_checkpoint(ckpt_path)
        params, stats, constants = convert_state_dict(state)
        if meta:
            log.info(f"reference checkpoint: epoch {meta.get('epoch')} "
                     f"step {meta.get('global_step')}")
        variables = {"params": params, "batch_stats": stats,
                     "constants": constants}
        return AnimationTask(hp, model, variables, **task_kwargs)
    # read-only restore: no Experiment (which writes run-dir artifacts and
    # builds an optimizer), no template init — msgpack_restore rebuilds the
    # plain dict tree directly, so serving from a read-only mount works
    with open(ckpt_path, "rb") as fp:
        payload = fser.msgpack_restore(fp.read())
    variables = {
        "params": payload["params"],
        "batch_stats": payload.get("batch_stats", {}),
        "constants": payload.get("constants", {}),
    }
    return AnimationTask(hp, model, variables, **task_kwargs)


def _is_torch_checkpoint(path: str) -> bool:
    """Sniff a reference (torch pickle) checkpoint vs our msgpack format:
    torch.save writes a zip ("PK") or a legacy pickle (protocol marker
    0x80); msgpack maps start with 0x8x/0xde/0xdf."""
    with open(path, "rb") as fp:
        head = fp.read(2)
    return head[:2] == b"PK" or (len(head) == 2 and head[0] == 0x80
                                 and head[1] in (2, 3, 4, 5))


def load_traced(dump_dir: str, **task_kwargs) -> AnimationTask:
    """Rebuild an inference-ready AnimationTask from a trace_model dump
    (the deployment counterpart of the reference's traced-model loading,
    api.py:169-197): hparams.json + model.msgpack are self-contained."""
    import flax.serialization as fser

    from .utils.config import ConfigDict

    hp = ConfigDict.parse_file(os.path.join(dump_dir, "hparams.json"))
    with open(os.path.join(dump_dir, "model.msgpack"), "rb") as fp:
        variables = fser.msgpack_restore(fp.read())
    model = build_model(hp, load_pca=False)
    return AnimationTask(hp, model, variables, **task_kwargs)
