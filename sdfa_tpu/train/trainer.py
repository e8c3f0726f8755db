"""Experiment + Trainer: the training runtime.

Reference: saber/trainer/manager/{experiment.py,trainer.py} and
saber_model/saber_model.py.  TPU-native re-design:

- the whole optimization step (forward, losses with dynamic scalers,
  backward, Adam update, BatchNorm stat update) is ONE jitted SPMD program;
- data parallelism = batch sharding over a jax.sharding.Mesh ``data`` axis
  (gradients all-reduce over ICI automatically) — replacing the reference's
  threaded DataParallel (data_parallel.py:9);
- scheduler/scaler state is explicit (host lr computation like the
  reference's host-side _LRScheduler; scaler EMA inside the step);
- observability: per-epoch loss CSV (loss_info.py), JSONL metrics stream,
  params_info.txt dump (experiment.py:44-50), resolved hparams.json.
"""

from __future__ import annotations

import csv
import datetime
import json
import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import losses as L
from ..models.sdfa import SpeechDrivenAnimation
from ..parallel import mesh as mesh_lib
from ..utils import log
from ..utils.config import ConfigDict
from . import checkpoints as ckpt_io
from . import lr_schedules
from . import summary as summary_lib


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any
    scalers: Dict[str, L.ScalerState]
    step: jnp.ndarray  # global step counter (int32)


def _scaler_names(face_type: str):
    if face_type == "dgrad_3d":
        return ("dyn_p_scale", "dyn_m_scale", "dyn_p_rotat", "dyn_m_rotat", "dyn_e")
    return ("dyn_p", "dyn_m", "dyn_e")


def make_loss_fn(model: SpeechDrivenAnimation, hparams: ConfigDict):
    """Returns loss_fn(params, batch_stats, constants, scalers, batch, rng,
    training) → (total, (aux))."""
    hp_loss = hparams.loss
    is_dgrad = model.face_type == "dgrad_3d"
    is_face_data = model.pred_type == "face_data"
    postfix = "_pca" if model.pred_type.startswith("pca") else ""
    dyn = bool(hp_loss.get("dynamic_scalar", False))
    p_scale = float(hp_loss.get("ploss_scale", 1))
    m_scale = float(hp_loss.get("mloss_scale", 1))
    weight_key = hp_loss.get("anime_loss_weight")

    feat_spec = None
    try:
        from ..data.device_features import FeatureSpec

        feat_spec = FeatureSpec.from_hparams(hparams)
    except Exception:
        pass  # hparams without audio config (unit tests)

    def loss_fn(params, batch_stats, constants, scalers, batch, rng, training: bool):
        variables = {"params": params, "batch_stats": batch_stats, "constants": constants}
        rngs = {"dropout": rng}
        if "raw_wav" in batch:
            # on-device feature pipeline (data/device_features.py): the host
            # ships raw windows + augmentation knobs only
            from ..data.device_features import device_train_features

            audio_feat = device_train_features(
                batch["raw_wav"], batch["preemph"], batch["t_idx"],
                batch["f_idx"], batch["feat_scale"], batch["drop_rows"],
                batch["drop_is_max"], batch["drop_thres"], spec=feat_spec,
            )
        else:
            audio_feat = batch["audio_feat"]
        if training:
            (preds, z_audio, aligns), mutated = model.apply(
                variables, audio_feat, batch["speaker_id"],
                training=True, mutable=["batch_stats"], rngs=rngs,
            )
            new_stats = mutated["batch_stats"]
        else:
            preds, z_audio, aligns = model.apply(
                variables, audio_feat, batch["speaker_id"],
                training=False, rngs=rngs,
            )
            new_stats = batch_stats

        bsz = audio_feat.shape[0]
        weights = batch.get(weight_key) if weight_key else None
        if weights is None:
            weights = jnp.ones((bsz,), jnp.float32)

        scalars: Dict[str, jnp.ndarray] = {}
        loss_terms: Dict[str, jnp.ndarray] = {}
        new_scalers = dict(scalers)
        kw = dict(is_dgrad=is_dgrad, is_face_data=is_face_data)

        def _decode_coef(name, coef):
            """PCA-coefficient targets (trainer.pca_targets) decode on
            device inside the loss — the host ships 85+180 floats/frame
            instead of 89,784 (~350× smaller upload over the tunnel)."""
            sub = constants[name]
            return (jnp.matmul(jnp.asarray(coef, jnp.float32), sub["compT"].T,
                               precision=jax.lax.Precision.HIGHEST)
                    + sub["means"])

        if is_dgrad:
            pred_s = preds[f"dgrad_3d_scale{postfix}"]
            pred_r = preds[f"dgrad_3d_rotat{postfix}"]
            if "dgrad_3d_scale_coef" in batch:
                true_s = _decode_coef("scale_pca", batch["dgrad_3d_scale_coef"])
                true_r = _decode_coef("rotat_pca", batch["dgrad_3d_rotat_coef"])
            else:
                # f32 cast is a no-op unless trainer.compact_targets shipped f16
                true_s = jnp.asarray(batch[f"dgrad_3d_scale{postfix}"], jnp.float32)
                true_r = jnp.asarray(batch[f"dgrad_3d_rotat{postfix}"], jnp.float32)
            if is_face_data:
                # stay in the flat layout (no (…, tris, k) padded temps in
                # fwd/bwd): sum-over-k-then-mean-over-tris == flat-sum ÷ tris
                true_s = true_s.reshape(true_s.shape[:2] + (-1,))
                true_r = true_r.reshape(true_r.shape[:2] + (-1,))
                ps = L.ploss_flat(pred_s, true_s, weights, group=6)
                ms = L.mloss_flat(pred_s, true_s, weights, group=6)
                pr = L.ploss_flat(pred_r, true_r, weights, group=3, exp_values=True)
                mr = L.mloss_flat(pred_r, true_r, weights, group=3, exp_values=True)
            else:
                ps = L.ploss(pred_s, true_s, weights, **kw)
                ms = L.mloss(pred_s, true_s, weights, **kw)
                pr = L.ploss(pred_r, true_r, weights, **kw)
                mr = L.mloss(pred_r, true_r, weights, **kw)
            scalars.update(scalar_ps=ps, scalar_ms=ms, scalar_pr=pr, scalar_mr=mr,
                           scalar_ploss=ps + pr, scalar_mloss=ms + mr)
            if dyn:
                terms = [("dyn_ps", ps, "dyn_p_scale", p_scale),
                         ("dyn_ms", ms, "dyn_m_scale", m_scale),
                         ("dyn_pr", pr, "dyn_p_rotat", p_scale),
                         ("dyn_mr", mr, "dyn_m_rotat", m_scale)]
                for key, val, sname, scl in terms:
                    scaled, new_scalers[sname] = L.dynamic_scale(
                        val, scalers[sname], training)
                    loss_terms[key] = scaled * scl
            else:
                loss_terms.update(loss_ps=ps * p_scale, loss_ms=ms * m_scale,
                                  loss_pr=pr * p_scale, loss_mr=mr * m_scale)
        else:
            pred = preds[f"{model.face_type}{postfix}"]
            if f"{model.face_type}_coef" in batch:
                true = _decode_coef("pca", batch[f"{model.face_type}_coef"])
            else:
                true = jnp.asarray(batch[f"{model.face_type}{postfix}"], jnp.float32)
            pl = L.ploss(pred, true, weights, **kw)
            ml = L.mloss(pred, true, weights, **kw)
            scalars.update(scalar_ploss=pl, scalar_mloss=ml)
            if dyn:
                scaled_p, new_scalers["dyn_p"] = L.dynamic_scale(pl, scalers["dyn_p"], training)
                scaled_m, new_scalers["dyn_m"] = L.dynamic_scale(ml, scalers["dyn_m"], training)
                loss_terms.update(dyn_ploss=scaled_p * p_scale, dyn_mloss=scaled_m * m_scale)
            else:
                loss_terms.update(loss_ploss=pl * p_scale, loss_mloss=ml * m_scale)

        total = sum(loss_terms.values())
        scalars["total"] = total
        aux = dict(new_stats=new_stats, new_scalers=new_scalers,
                   scalars=scalars, loss_terms=loss_terms)
        return total, aux

    return loss_fn


def make_optimizer(hparams: ConfigDict):
    """Adam (optionally AdamW) with runtime lr/beta1 injection."""
    opt = hparams.optim
    args = dict(opt.get("args") or {})
    base_lr = float(args.get("lr", 1e-3))
    wd = float(args.get("weight_decay", 0) or 0)
    sched = opt.get("lr_scheduler") or None
    lr_fn, beta1_fn, mode = lr_schedules.build(
        sched.get("name") if sched else None,
        base_lr,
        sched.get("args") if sched else None,
    )
    name = opt.get("name", "Adam")
    assert name in ("Adam", "AdamW"), f"optimizer '{name}' not supported yet"
    if wd > 0 or name == "AdamW":
        tx = optax.inject_hyperparams(optax.adamw)(learning_rate=base_lr, b1=0.9, weight_decay=wd)
    else:
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=base_lr, b1=0.9)
    grad_clip = hparams.get("trainer", {}).get("grad_clip")
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)
    return tx, lr_fn, beta1_fn, mode, base_lr


def make_train_step(model, hparams, tx, donate: bool = True):
    loss_fn = make_loss_fn(model, hparams)

    def train_step(state: TrainState, batch, rng, lr, beta1):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(
            state.params, state.batch_stats, state.constants,
            state.scalers, batch, rng, True,
        )
        opt_state = state.opt_state
        inject = opt_state
        if not hasattr(inject, "hyperparams"):  # grad-clip chain wraps it
            inject = next(s for s in opt_state if hasattr(s, "hyperparams"))
        inject.hyperparams["learning_rate"] = lr
        if "b1" in inject.hyperparams:
            inject.hyperparams["b1"] = beta1
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # total grad norm (reference GradInformation, grads.py:8-29)
        grad_norm = optax.global_norm(grads)
        new_state = state.replace(
            params=new_params,
            batch_stats=aux["new_stats"],
            opt_state=new_opt_state,
            scalers=aux["new_scalers"],
            step=state.step + 1,
        )
        metrics = {**aux["scalars"], **aux["loss_terms"], "grad_norm": grad_norm, "lr": lr}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, hparams):
    loss_fn = make_loss_fn(model, hparams)

    def eval_step(state: TrainState, batch, rng):
        _, aux = loss_fn(
            state.params, state.batch_stats, state.constants,
            state.scalers, batch, rng, False,
        )
        return {**aux["scalars"], **aux["loss_terms"]}

    return jax.jit(eval_step)


class Experiment:
    """Composition root (reference experiment.py:17): dirs, state, ckpts,
    metric writers."""

    def __init__(
        self,
        hparams: ConfigDict,
        model: SpeechDrivenAnimation,
        log_dir: str,
        training: bool = True,
        load_from: Optional[str] = None,
        seed: int = 1234,
    ):
        self.hp = hparams
        self.model = model
        self.log_dir = log_dir
        self.training = training
        os.makedirs(log_dir, exist_ok=True)
        os.makedirs(os.path.join(log_dir, "train_log", "loss"), exist_ok=True)
        hparams.dump(os.path.join(log_dir, "hparams.json"))

        # multi-host: join the pod runtime BEFORE building the mesh so
        # jax.devices() spans all hosts (SURVEY.md §5 distributed backend;
        # no-op on a single process — tested path)
        self.multihost = bool((hparams.get("trainer") or {}).get("multihost", False))
        if self.multihost and training:
            from ..parallel import multihost as mh

            mh.maybe_initialize_distributed()
        self.mesh = mesh_lib.make_mesh()
        self.n_devices = len(self.mesh.devices.reshape(-1))
        if jax.process_count() > 1:
            log.info(f"multi-host run: {jax.process_count()} processes, "
                     f"{self.n_devices} devices total")

        # init model state
        rng = jax.random.PRNGKey(seed)
        self.rng, init_rng, drop_rng = jax.random.split(rng, 3)
        # per-step dropout keys are FOLDED from this base by global step
        # (not split sequentially): a run resumed from a checkpoint replays
        # the identical rng stream, so resumed ≡ uninterrupted holds
        # exactly (tests/test_experiment_resume.py::test_resume_equivalence)
        self.rng_base = jax.random.fold_in(rng, 7)
        feat_shape = self._example_feat_shape()
        feat = jnp.zeros(feat_shape, jnp.float32)
        spk = jnp.zeros((feat_shape[0],), jnp.int32)
        variables = model.init(
            {"params": init_rng, "dropout": drop_rng}, feat, spk, False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        constants = variables.get("constants", {})

        self.tx, self.lr_fn, self.beta1_fn, self.sched_mode, self.base_lr = (
            make_optimizer(hparams)
        )
        opt_state = self.tx.init(params)
        scalers = {name: L.ScalerState.init() for name in _scaler_names(model.face_type)}
        self.state = TrainState(
            params=params, batch_stats=batch_stats, constants=constants,
            opt_state=opt_state, scalers=scalers, step=jnp.zeros((), jnp.int32),
        )
        self.epoch = 0

        self._dump_params_info()
        if load_from:
            self.load(load_from)

        # replicate state across the mesh
        self.state = mesh_lib.replicate(self.mesh, self.state)

        self.train_step_fn = make_train_step(model, hparams, self.tx)
        self.eval_step_fn = make_eval_step(model, hparams)
        self._metrics_fp = open(os.path.join(log_dir, "train_log", "metrics.jsonl"), "a")
        self.summary = summary_lib.SummaryHelper(os.path.join(log_dir, "train_log", "tb"))

        plot_feat_spec = None
        try:
            from ..data.device_features import FeatureSpec

            plot_feat_spec = FeatureSpec.from_hparams(hparams)
        except Exception:
            pass  # hparams without audio config (unit tests)

        def plot_forward(state, batch, rng):
            if "raw_wav" in batch:  # raw-mode batches (data/device_features)
                from ..data.device_features import device_train_features

                audio_feat = device_train_features(
                    batch["raw_wav"], batch["preemph"], batch["t_idx"],
                    batch["f_idx"], batch["feat_scale"], batch["drop_rows"],
                    batch["drop_is_max"], batch["drop_thres"],
                    spec=plot_feat_spec,
                )
                batch = dict(batch, audio_feat=audio_feat)
            preds, z, aligns = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": state.constants},
                batch["audio_feat"], batch["speaker_id"], False,
                rngs={"dropout": rng},
            )
            # hand the featurized batch back too — the TB plot plugins
            # visualize batch["audio_feat"]
            return dict(prediction=preds, latent=z, align_dict=aligns,
                        audio_feat=batch["audio_feat"])

        self.plot_forward_fn = jax.jit(plot_forward)

    def _example_feat_shape(self):
        frames = int(self.hp.audio.feature.get("sliding_window_frames", 64))
        n_mels = int(self.hp.audio.get("mel", {}).get("n_mels", 128))
        channels = 3 if self.hp.audio.feature.get("with_delta", True) else 1
        return (2, frames, n_mels, channels)

    def _dump_params_info(self):
        lines = []
        total = 0
        flat = flax.traverse_util.flatten_dict(self.state.params)
        for path, value in sorted(flat.items()):
            n = int(np.prod(value.shape))
            total += n
            lines.append(f"{'/'.join(path)}  {tuple(value.shape)}  {n}")
        lines.append(f"TOTAL: {total}")
        with open(os.path.join(self.log_dir, "params_info.txt"), "w") as fp:
            fp.write("\n".join(lines) + "\n")
        log.info(f"model parameters: {total:,}")

    # -- metric IO ---------------------------------------------------------
    def write_metrics(self, tag: str, metrics: Dict[str, float], step: int):
        rec = {"tag": tag, "step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._metrics_fp.write(json.dumps(rec) + "\n")
        self._metrics_fp.flush()

    def write_loss_csv(self, history):
        """Rewrite epoch-loss.csv each epoch (reference loss_info.py:4-41)."""
        path = os.path.join(self.log_dir, "train_log", "loss", "epoch-loss.csv")
        if not history:
            return
        keys = sorted({k for row in history for k in row if k != "epoch"})
        with open(path, "w", newline="") as fp:
            writer = csv.writer(fp)
            writer.writerow(["epoch"] + keys)
            for row in history:
                writer.writerow([row.get("epoch")] + [row.get(k, "") for k in keys])

    # -- checkpoint IO -------------------------------------------------------
    def _payload(self):
        state = jax.device_get(self.state)
        return dict(
            epoch=self.epoch,
            global_step=int(state.step),
            params=state.params,
            batch_stats=state.batch_stats,
            constants=state.constants,
            opt_state=state.opt_state,
            scalers={k: tuple(np.asarray(x) for x in v) for k, v in state.scalers.items()},
        )

    def save(self, max_nb: int = 10):
        return ckpt_io.save_checkpoint(
            self.log_dir, self._payload(), self.epoch, int(jax.device_get(self.state.step)),
            max_nb=max_nb,
        )

    def save_best(self, metric_name: str, value: float):
        return ckpt_io.save_best(
            self.log_dir, self._payload(), metric_name, value,
            self.epoch, int(jax.device_get(self.state.step)),
        )

    def load(self, path: str):
        template = self._payload()
        payload = ckpt_io.load_checkpoint(path, template)
        self.epoch = int(payload["epoch"])
        scalers = {
            k: L.ScalerState(vt=jnp.asarray(v[0]), beta_t=jnp.asarray(v[1]))
            for k, v in payload["scalers"].items()
        }
        self.state = TrainState(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            constants=payload["constants"],
            opt_state=payload["opt_state"],
            scalers=scalers,
            step=jnp.asarray(payload["global_step"], jnp.int32),
        )
        log.info(f"restored checkpoint from {path} (epoch {self.epoch})")

    # -- batch placement --------------------------------------------------------
    def put_batch(self, batch):
        """Host batch → mesh-sharded global batch. Single process: a plain
        sharded device_put; multi-host: each process contributes its local
        shard via jax.make_array_from_process_local_data
        (parallel/multihost.py)."""
        from ..parallel import multihost as mh

        return mh.global_batch_from_local(self.mesh, batch)

    # -- lr --------------------------------------------------------------------
    def current_lr(self, step_hint: Optional[int] = None) -> Tuple[float, float]:
        # step mode: the reference increments global_step BEFORE stepping the
        # scheduler (manager/trainer.py), so the first optimization step
        # evaluates the schedule at counter 1, not 0. step_hint (the
        # Trainer's host-side step mirror) avoids a per-step device sync —
        # 35 ms/step on tunnel-attached hosts.
        it = (self.epoch if self.sched_mode == "epoch"
              else (int(jax.device_get(self.state.step))
                    if step_hint is None else int(step_hint)) + 1)
        lr = float(self.lr_fn(jnp.asarray(it)))
        b1 = float(self.beta1_fn(jnp.asarray(it))) if self.beta1_fn else 0.9
        return lr, b1


class Trainer:
    """Epoch/step loop with hook registry (reference trainer.py:10-548)."""

    _hooks: Dict[str, list] = {k: [] for k in (
        "prev_train", "post_train", "prev_valid", "post_valid",
        "prev_epoch", "post_epoch")}

    @classmethod
    def register_hook(cls, point: str):
        assert point in cls._hooks, f"unknown hook point: {point}"

        def deco(fn):
            cls._hooks[point].append(fn)
            return fn

        return deco

    def __init__(self, experiment: Experiment, train_loader, valid_loader=None,
                 aux_loaders: Optional[Dict[str, Any]] = None):
        self.exp = experiment
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        # aux datasets cycle forever and contribute extra optimization steps
        # per main batch (reference experiment.py:121-152 + trainer.py:283-315)
        self.aux_loaders = aux_loaders or {}
        self._aux_iters: Dict[str, Any] = {}
        hp_tr = experiment.hp.trainer
        self.max_epochs = int(hp_tr.get("max_epochs", 100))
        self.save_gap_epochs = hp_tr.get("save_gap_epochs")
        self.save_gap_steps = int(hp_tr.get("save_gap_steps", 0) or 0)
        # reference trainer.py:59 requires exactly one cadence; we default
        # to epoch cadence when neither is set, but reject both
        assert not (self.save_gap_epochs and self.save_gap_steps), \
            ("set save_gap_epochs XOR save_gap_steps, not both "
             "(the default config sets save_gap_epochs=10 — override it "
             "with save_gap_epochs=None to use step cadence)")
        # gap 0/None disables validation entirely — reference semantics
        # (_should_at_epoch returns False for falsy gaps, trainer.py:200-204);
        # the shipped configs set valid_gap_epochs=0 on purpose
        self.valid_gap_epochs = int(hp_tr.get("valid_gap_epochs", 0) or 0)
        self.metric_name = hp_tr.get("reference_metric", "ploss")
        self.metric_larger = bool(hp_tr.get("reference_metric_larger", False))
        self.best_metric = None
        self.grad_clip = hp_tr.get("grad_clip")
        self.plot_gap_steps = int(hp_tr.get("plot_gap_steps", 0) or 0)
        self.eval_gap_epochs = int(hp_tr.get("eval_gap_epochs", 0) or 0)
        # device-trace capture window (SURVEY §5 tracing; jax.profiler):
        # trainer.profile = {dir, start_step=10, num_steps=5}
        prof = hp_tr.get("profile") or {}
        self.profile_dir = prof.get("dir") if prof else None
        self.profile_start = int(prof.get("start_step", 10) or 0) if prof else 0
        self.profile_steps = int(prof.get("num_steps", 5) or 5) if prof else 0
        self._steps_seen = 0
        self._prof_active = False

    @staticmethod
    def _load_loss_history(exp):
        """Prior epochs' loss rows from the run dir (rows at or past the
        resumed epoch are dropped — they will be re-trained)."""
        path = os.path.join(exp.log_dir, "train_log", "loss", "epoch-loss.csv")
        if not os.path.exists(path):
            return []
        rows = []
        with open(path, newline="") as fp:
            for row in csv.DictReader(fp):
                try:
                    epoch = int(row["epoch"])
                except (KeyError, ValueError):
                    continue
                if epoch >= exp.epoch:
                    continue
                parsed = {"epoch": epoch}
                for k, v in row.items():
                    if k == "epoch" or v in ("", None):
                        continue
                    try:
                        parsed[k] = float(v)
                    except ValueError:
                        parsed[k] = v
                rows.append(parsed)
        return rows

    def _run_hooks(self, point: str, **kwargs):
        for fn in self._hooks[point]:
            fn(self.exp, **kwargs)

    def train(self):
        exp = self.exp
        log.info(f"training on {exp.n_devices} device(s), mesh={exp.mesh}")
        # host-side mirror of state.step (one device sync, then counted):
        # the per-step rng folds on it, so a resumed run continues the
        # exact stream without a per-step device round-trip
        self._host_step = int(jax.device_get(exp.state.step))
        while exp.epoch < self.max_epochs:
            self._run_hooks("prev_epoch", epoch=exp.epoch)
            t0 = time.time()
            train_metrics = self._train_epoch()
            if not train_metrics:
                # empty loader (e.g. a global max_steps cap already hit)
                log.info("no batches this epoch — stopping training")
                break
            epoch_row = {"epoch": exp.epoch, **{f"train_{k}": v for k, v in train_metrics.items()}}
            if (self.valid_loader is not None and self.valid_gap_epochs > 0
                    and (exp.epoch + 1) % self.valid_gap_epochs == 0):
                valid_metrics = self._validate()
                epoch_row.update({f"valid_{k}": v for k, v in valid_metrics.items()})
                metric = valid_metrics.get("scalar_" + self.metric_name,
                                           valid_metrics.get(self.metric_name))
                if metric is not None and self._is_better(metric):
                    self.best_metric = metric
                    exp.save_best(self.metric_name, metric)
            if not hasattr(self, "_history"):
                # resume: seed from the run dir's existing CSV so a
                # killed-and-resumed run keeps its full loss history
                # (write_loss_csv rewrites the file each epoch)
                self._history = self._load_loss_history(exp)
            self._history.append(epoch_row)
            exp.write_loss_csv(self._history)
            exp.epoch += 1
            if self.save_gap_epochs and exp.epoch % int(self.save_gap_epochs) == 0:
                exp.save()
            if self.eval_gap_epochs and exp.epoch % self.eval_gap_epochs == 0:
                self._evaluate_mid_training()
            exp.summary.flush()  # TB writers buffer; make epochs visible
            self._run_hooks("post_epoch", epoch=exp.epoch)
            log.info(
                f"epoch {exp.epoch}/{self.max_epochs} done in {time.time()-t0:.1f}s "
                f"train_ploss={train_metrics.get('scalar_ploss', float('nan')):.5f}"
            )
        exp.save()

    def _evaluate_mid_training(self):
        """Full video generation mid-training (reference trainer.py:494-497);
        skipped quietly when no eval sources are configured."""
        exp = self.exp
        sources = (exp.hp.trainer.get("evaluate") or {}).get("test") or []
        sources = [s for s in sources if os.path.exists(str(s[0]))]
        if not sources:
            return
        try:
            from ..task import AnimationTask

            variables = {
                "params": jax.device_get(exp.state.params),
                "batch_stats": jax.device_get(exp.state.batch_stats),
                "constants": jax.device_get(exp.state.constants),
            }
            task = AnimationTask(exp.hp, exp.model, variables)
            out_dir = os.path.join(exp.log_dir, "eval_at_train", f"epoch{exp.epoch:04d}")
            task.evaluate(sources, output_dir=out_dir, export_mesh_frames=False)
        except Exception as exc:
            log.warn(f"mid-training evaluate failed: {exc}")

    def _next_aux(self, name: str):
        """Cycling iterator over an aux loader (experiment.py:121-152)."""
        it = self._aux_iters.get(name)
        if it is None:
            it = iter(self.aux_loaders[name])
            self._aux_iters[name] = it
        try:
            return next(it)
        except StopIteration:
            self._aux_iters[name] = iter(self.aux_loaders[name])
            try:
                return next(self._aux_iters[name])
            except StopIteration:
                return None

    def _is_better(self, value: float) -> bool:
        if self.best_metric is None:
            return True
        return value > self.best_metric if self.metric_larger else value < self.best_metric

    def _fetch_put(self, loader_it):
        """Next batch, host→device upload DISPATCHED (device_put is async:
        the copy overlaps the already-running step's device compute —
        double-buffered upload, VERDICT r4 #4). Returns (device_batch,
        host_extra) or None at end of epoch."""
        batch = next(loader_it, None)
        if batch is None:
            return None
        # TB-only payloads (audio clips) never ride the device upload
        host_extra = {k: batch.pop(k) for k in ("signal",) if k in batch}
        return self.exp.put_batch(batch), host_extra

    def _train_epoch(self) -> Dict[str, float]:
        exp = self.exp
        device_metrics = []  # stays on device; fetched once at epoch end
        count = 0
        self._run_hooks("prev_train", epoch=exp.epoch)
        loader_it = iter(self.train_loader)
        pending = self._fetch_put(loader_it)
        while pending is not None:
            batch, host_extra = pending
            if (self.profile_dir and not self._prof_active
                    and self._steps_seen == self.profile_start):
                from .. import profiling

                profiling.start_trace(self.profile_dir)
                self._prof_active = True
            lr, b1 = exp.current_lr(self._host_step)
            step_rng = jax.random.fold_in(exp.rng_base, self._host_step)
            exp.state, metrics = exp.train_step_fn(
                exp.state, batch, step_rng, jnp.asarray(lr), jnp.asarray(b1)
            )
            self._host_step += 1
            # enqueue batch k+1's upload NOW, behind step k's async
            # dispatch: the transfer rides under the step's device time
            # instead of serializing ahead of step k+1
            pending = self._fetch_put(loader_it)
            device_metrics.append(metrics)
            for ai, name in enumerate(self.aux_loaders):
                aux_batch = self._next_aux(name)
                if aux_batch is None:
                    continue
                lr, b1 = exp.current_lr(self._host_step)
                aux_rng = jax.random.fold_in(step_rng, 1_000_003 + ai)
                aux_batch = exp.put_batch(aux_batch)
                exp.state, _ = exp.train_step_fn(
                    exp.state, aux_batch, aux_rng, jnp.asarray(lr), jnp.asarray(b1)
                )
                self._host_step += 1
            count += 1
            self._steps_seen += 1
            if self.save_gap_steps and self._steps_seen % self.save_gap_steps == 0:
                exp.save()
            if (self._prof_active
                    and self._steps_seen >= self.profile_start + self.profile_steps):
                from .. import profiling

                jax.device_get(metrics)  # drain async dispatch into the trace
                profiling.stop_trace()
                self._prof_active = False
                self.profile_dir = None  # one capture window per run
                log.info("profiler trace captured")
            if count % 50 == 0:
                step_now = int(jax.device_get(exp.state.step))
                vals = {k: float(v) for k, v in jax.device_get(metrics).items()}
                exp.write_metrics("train", vals, step_now)
                exp.summary.scalar("train", vals, step_now)
            if self.plot_gap_steps and count % self.plot_gap_steps == 0:
                exp.rng, plot_rng = jax.random.split(exp.rng)
                outputs = jax.device_get(exp.plot_forward_fn(exp.state, batch, plot_rng))
                summary_lib.run_plot_plugins(
                    exp.summary, exp, {**jax.device_get(batch), **host_extra},
                    outputs, int(jax.device_get(exp.state.step)),
                )
        self._run_hooks("post_train", epoch=exp.epoch)
        if self._prof_active:  # run ended inside the capture window — flush
            from .. import profiling

            profiling.stop_trace()
            self._prof_active = False
            self.profile_dir = None
            log.info("profiler trace captured (flushed at epoch end)")
        elif self.profile_dir and self._steps_seen <= self.profile_start:
            log.warn(
                f"profile window never opened: start_step="
                f"{self.profile_start} but only {self._steps_seen} steps ran"
            )
        if not device_metrics:
            return {}
        host = jax.device_get(device_metrics)
        agg: Dict[str, float] = {}
        for m in host:
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        return {k: v / len(host) for k, v in agg.items()}

    def _validate(self) -> Dict[str, float]:
        exp = self.exp
        agg: Dict[str, float] = {}
        count = 0
        self._run_hooks("prev_valid", epoch=exp.epoch)
        for batch in self.valid_loader:
            exp.rng, step_rng = jax.random.split(exp.rng)
            batch = exp.put_batch(batch)
            metrics = exp.eval_step_fn(exp.state, batch, step_rng)
            vals = {k: float(v) for k, v in jax.device_get(metrics).items()}
            for k, v in vals.items():
                agg[k] = agg.get(k, 0.0) + v
            count += 1
        self._run_hooks("post_valid", epoch=exp.epoch)
        out = {k: v / max(count, 1) for k, v in agg.items()}
        exp.write_metrics("valid", out, int(jax.device_get(exp.state.step)))
        return out
