"""TensorBoard summary helper + plot plugin registry.

Reference: saber/trainer/manager/tb_helpers.py:5-62 (nested-scalar/image/
audio/text/mesh wrappers) and experiment.py:158-185 (register_plot plugin
registry, with the two shipped plugins in speech_anime/model/logger.py —
pred/true meshes, input feature maps, attention alignments, audio clips).

TensorBoard comes via torch.utils.tensorboard (present in this image); all
writes are optional — the JSONL/CSV streams in trainer.py remain the
primary record.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

from ..utils import log


class SummaryHelper:
    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception as exc:  # pragma: no cover
            log.warn(f"tensorboard unavailable: {exc}")
            self._writer = None

    @property
    def enabled(self) -> bool:
        return self._writer is not None

    def scalar(self, tag: str, value, step: int):
        """Nested dicts flatten into tag paths (tb_helpers.py:14-27)."""
        if self._writer is None:
            return
        if isinstance(value, dict):
            for key, val in value.items():
                self.scalar(f"{tag}/{key}", val, step)
        else:
            self._writer.add_scalar(tag, float(value), step)

    def image(self, tag: str, img: np.ndarray, step: int):
        if self._writer is None:
            return
        img = np.asarray(img)
        if img.ndim == 2:
            img = img[None]
        elif img.ndim == 3 and img.shape[-1] in (1, 3, 4):
            img = np.transpose(img, (2, 0, 1))  # HWC → CHW
        self._writer.add_image(tag, img, step)

    def audio(self, tag: str, signal: np.ndarray, sr: int, step: int):
        if self._writer is None:
            return
        self._writer.add_audio(tag, np.asarray(signal)[None], step, sample_rate=sr)

    def text(self, tag: str, text: str, step: int):
        if self._writer is None:
            return
        self._writer.add_text(tag, text, step)

    def mesh(self, tag: str, verts: np.ndarray, faces: Optional[np.ndarray], step: int):
        if self._writer is None:
            return
        import torch

        # copy: torch rejects (warns on) non-writable numpy views
        v = torch.from_numpy(np.array(verts, np.float32))[None]
        f = torch.from_numpy(np.asarray(faces, np.int32))[None] if faces is not None else None
        self._writer.add_mesh(tag, vertices=v, faces=f, global_step=step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


# -- plot plugin registry (experiment.py:158-185) -----------------------------
_PLOT_PLUGINS: List[Callable] = []


def register_plot(fn: Callable) -> Callable:
    """Decorator: fn(summary, experiment, batch, outputs, step) called every
    plot_gap_steps during training."""
    _PLOT_PLUGINS.append(fn)
    return fn


def run_plot_plugins(summary: "SummaryHelper", experiment, batch, outputs, step: int):
    for fn in _PLOT_PLUGINS:
        try:
            fn(summary, experiment, batch, outputs, step)
        except Exception as exc:  # plugins must never kill training
            log.warn(f"plot plugin {fn.__name__} failed: {exc}")


# -- shipped plugins (speech_anime/model/logger.py:14-103 equivalents) --------
@register_plot
def plot_input_features(summary, experiment, batch, outputs, step):
    # raw-mode batches carry raw_wav only; plot_forward returns the
    # featurized audio_feat in outputs instead
    feats = batch.get("audio_feat")
    if feats is None and isinstance(outputs, dict):
        feats = outputs.get("audio_feat")
    if feats is None:
        return
    feats = np.asarray(feats)[:1]  # (1, T, F, C)
    if feats.ndim != 4:
        return
    from ..utils import visualizer

    img = visualizer.color_mapping(feats[0, :, :, 0].T)  # mel channel (F, T)
    summary.image("inputs/mel", img, step)


@register_plot
def plot_anime_frames(summary, experiment, batch, outputs, step):
    """pred/true mesh frames via add_mesh (reference logger.py:14-34
    plot_anime_frames): decode the first window's prediction and target to
    vertices and write both as TB meshes."""
    preds = outputs.get("prediction") if isinstance(outputs, dict) else None
    model = getattr(experiment, "model", None)
    if preds is None or model is None or not summary.enabled:
        return
    face_type = model.face_type
    if face_type not in ("dgrad_3d", "verts_off_3d", "verts_pos_3d"):
        return
    import jax

    from ..viewer import frame as frame_mod

    state = experiment.state
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": state.constants}
    one = {k: np.asarray(v)[:1] for k, v in preds.items()}
    pred_frame = np.asarray(
        jax.device_get(model.decode_to_anime(variables, one)))[0, 0]

    # target: raw frames, or PCA-coefficient targets decoded with the
    # model's frozen constants (trainer.pca_targets shipping mode)
    consts = jax.device_get(state.constants)

    def _coef_decode(name, coef):
        sub = consts[name]
        return coef @ np.asarray(sub["compT"]).T + np.asarray(sub["means"])

    true_frame = None
    if face_type == "dgrad_3d":
        if "dgrad_3d_scale" in batch:
            s = np.asarray(batch["dgrad_3d_scale"][0, 0], np.float32)
            r = np.asarray(batch["dgrad_3d_rotat"][0, 0], np.float32)
            true_frame = np.concatenate([s, r], axis=-1).reshape(-1)
        elif "dgrad_3d_scale_coef" in batch and "scale_pca" in consts:
            s = _coef_decode("scale_pca",
                             np.asarray(batch["dgrad_3d_scale_coef"][0, 0]))
            r = _coef_decode("rotat_pca",
                             np.asarray(batch["dgrad_3d_rotat_coef"][0, 0]))
            n_tris = s.shape[-1] // 6
            true_frame = np.concatenate(
                [s.reshape(n_tris, 6), r.reshape(n_tris, 3)],
                axis=-1).reshape(-1)
    else:
        if face_type in batch:
            true_frame = np.asarray(batch[face_type][0, 0], np.float32).reshape(-1)
        elif f"{face_type}_coef" in batch and "pca" in consts:
            true_frame = _coef_decode(
                "pca", np.asarray(batch[f"{face_type}_coef"][0, 0])).reshape(-1)

    verts_p, faces = frame_mod.frames_to_meshes(pred_frame, face_type)
    summary.mesh("anime-0/frame-pred", verts_p[0], faces, step)
    if true_frame is not None:
        verts_t, _ = frame_mod.frames_to_meshes(true_frame, face_type)
        summary.mesh("anime-0/frame-true", verts_t[0], faces, step)


@register_plot
def plot_audio_clips(summary, experiment, batch, outputs, step):
    """Input audio clips (reference logger.py:95-103 _add_audio). Host-
    feature batches carry the window signal when plotting is enabled
    (dataset ``signal`` key); raw-mode batches always carry raw_wav."""
    sig = batch.get("signal")
    if sig is None:
        sig = batch.get("raw_wav")
    if sig is None:
        return
    sr = int(experiment.hp.audio.sample_rate)
    summary.audio("anime-0/audio-signal", np.asarray(sig)[0], sr, step)


@register_plot
def plot_attention_alignment(summary, experiment, batch, outputs, step):
    aligns = outputs.get("align_dict") if isinstance(outputs, dict) else None
    if not aligns:
        return
    from ..utils import visualizer

    for tag, align in aligns.items():
        a = np.asarray(align)[0]  # (1, T)
        summary.image(f"align/{tag}", visualizer.color_mapping(a), step)
