"""On-device training feature pipeline (mel + the §2.4 augmentations).

The reference (and our host twin) computes per-window mel features with
augmentations on the CPU inside DataLoader workers — with ONE host CPU in
this image that bounds training ~40× below the device step (DESIGN.md §9).

Key insight: every mel-space augmentation in SURVEY.md §2.4 except the
elementwise ones is LINEAR along one axis:

- time extension (±et frames) + cv2 INTER_LINEAR resize back → a (72, 64)
  operator per et, built by pushing identity columns through cv2.resize —
  bit-faithful to the host path by construction;
- freq extra/truncate rows (zero/reflect pad, low/high side, optional
  truncation) + resize → a (128, 128) operator per
  (ef, lower, trunc, pad_mode) variant, built by pushing identity rows
  through the host implementation itself;
- multiplicative sine scale, additive noise, row dropout → elementwise.

So the device pipeline is: raw 5056-sample windows (fixed max-extension
slice) → per-sample preemphasis → 72-frame mel (DFT matmuls) → two batched
operator matmuls (freq/time gathered per sample from the banks) → scale /
dropout → Δ/Δ² matmuls. Host work per item drops to RNG + np.load + a wav
slice; payload shrinks 98 KB → 40 KB per window.

Augmentation KNOBS are still sampled on the host (same RNG semantics,
identical ``random_args`` sharing for the adjacent-window pair).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import dsp
from ..nn.precision import OPS_PREC as _PREC

MAX_EX_TIME = 4   # random_mel_extra time range (config ±4)
MAX_EX_FEAT = 5   # random_mel_extra freq range (config ±5)
T_OUT = 64
T_EXT = T_OUT + 2 * MAX_EX_TIME  # 72 computed mel frames per raw window


def raw_window_samples(win_size: int, hop_size: int, frames: int = T_OUT) -> int:
    """Raw slice length covering the maximum time extension."""
    return hop_size * (frames - 1) + win_size + 2 * MAX_EX_TIME * hop_size


# ---------------------------------------------------------------------------
# operator banks (host-precomputed, cached)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def time_op_bank() -> np.ndarray:
    """(9, T_EXT, T_OUT): for et ∈ [−4..4], map the 72 computed frames to the
    64 output frames exactly as slice+cv2.resize does on the host."""
    import cv2

    bank = np.zeros((2 * MAX_EX_TIME + 1, T_EXT, T_OUT), np.float32)
    for k, et in enumerate(range(-MAX_EX_TIME, MAX_EX_TIME + 1)):
        t_aug = T_OUT + 2 * et
        lo = MAX_EX_TIME - et  # first used frame inside the 72
        eye = np.eye(t_aug, dtype=np.float32)
        # cv2.resize acts on (rows=F, cols=T); resize each basis "column"
        resized = cv2.resize(eye, (T_OUT, t_aug), interpolation=cv2.INTER_LINEAR)
        # resized[s, t] = weight of input frame s in output frame t
        bank[k, lo : lo + t_aug, :] = resized
    return bank


@functools.lru_cache(maxsize=None)
def freq_op_bank(n_mels: int = 128) -> np.ndarray:
    """(n_variants, n_mels, n_mels) row operators for every
    (ef, lower, trunc, pad_mode) combination, built by pushing identity rows
    through the host pad/truncate/resize implementation."""
    import cv2

    ops = []
    for ef in range(-MAX_EX_FEAT, MAX_EX_FEAT + 1):
        for lower in (False, True):
            for trunc in (False, True):
                for mode in ("constant", "reflect"):
                    eye = np.eye(n_mels, dtype=np.float32)
                    feat = eye  # rows = mel bins, cols = basis index
                    if ef < 0:
                        feat = feat[-ef:] if lower else feat[:ef]
                    elif ef > 0:
                        if lower:
                            feat = np.pad(feat, [(ef, 0), (0, 0)], "constant")
                            if trunc:
                                feat = feat[:-ef]
                        else:
                            feat = np.pad(feat, [(0, ef), (0, 0)], mode)
                            if trunc:
                                feat = feat[ef:]
                    if feat.shape[0] != n_mels:
                        feat = cv2.resize(feat, (n_mels, n_mels),
                                          interpolation=cv2.INTER_LINEAR)
                    # feat[o, i] = weight of input row i in output row o
                    ops.append(feat)
    return np.stack(ops)


def freq_variant_index(ef: int, lower: bool, trunc: bool, pad_mode: str) -> int:
    return (((ef + MAX_EX_FEAT) * 2 + int(lower)) * 2 + int(trunc)) * 2 + int(
        pad_mode == "reflect"
    )


# ---------------------------------------------------------------------------
# the device pipeline
# ---------------------------------------------------------------------------
class FeatureSpec:
    """Hashable static config for the jitted featurizer."""

    def __init__(self, sr: int, win_size: int, hop_size: int, n_mels: int,
                 fmin: float, fmax: float, ref_db: float, top_db: float,
                 win_fn: str = "hamm"):
        self.sr, self.win_size, self.hop_size = sr, win_size, hop_size
        self.n_mels, self.fmin, self.fmax = n_mels, fmin, fmax
        self.ref_db, self.top_db, self.win_fn = ref_db, top_db, win_fn

    @classmethod
    def from_hparams(cls, hp) -> "FeatureSpec":
        mel = dict(hp.audio.mel)
        sr = int(hp.audio.sample_rate)
        for key in ("win_size", "hop_size"):
            if isinstance(mel[key], float):
                mel[key] = int(mel[key] * sr)
        return cls(sr=sr, win_size=int(mel["win_size"]), hop_size=int(mel["hop_size"]),
                   n_mels=int(mel["n_mels"]), fmin=mel["fmin"], fmax=mel["fmax"],
                   ref_db=mel["ref_db"], top_db=mel["top_db"],
                   win_fn=mel.get("win_fn", "hamm"))


@functools.partial(jax.jit, static_argnames=("spec",))
def device_train_features(
    raw_wav: jnp.ndarray,      # (N, R) fixed-length raw windows
    preemph: jnp.ndarray,      # (N,) per-sample preemphasis coefficient
    t_idx: jnp.ndarray,        # (N,) int32 index into time_op_bank
    f_idx: jnp.ndarray,        # (N,) int32 index into freq_op_bank
    feat_scale: jnp.ndarray,   # (N, n_mels) multiplicative scale (1.0 = off)
    drop_rows: jnp.ndarray,    # (N, n_mels) 1.0 where the row is dropped
    drop_is_max: jnp.ndarray,  # (N,) 1.0 → "max" mode, 0.0 → "zero" mode
    drop_thres: jnp.ndarray,   # (N,) threshold for "max" mode
    *,
    spec: FeatureSpec,
) -> jnp.ndarray:
    """→ (N, T_OUT, n_mels, 3) training features, parity with the host path."""
    # per-sample preemphasis
    wav = jnp.concatenate(
        [raw_wav[:, :1], raw_wav[:, 1:] - preemph[:, None] * raw_wav[:, :-1]],
        axis=1,
    )
    # reference parity: the host preemphasizes the et-window in isolation, so
    # its first sample keeps no context (misc.py:8-20). That sample sits at
    # (MAX_EX_TIME − et)·hop inside our raw slice — restore it per sample.
    et = t_idx.astype(jnp.int32) - MAX_EX_TIME
    start_pos = (MAX_EX_TIME - et) * spec.hop_size  # (N,)
    onehot = (jnp.arange(raw_wav.shape[1])[None, :] == start_pos[:, None])
    wav = jnp.where(onehot, raw_wav, wav)
    # 72-frame mel
    fidx = (np.arange(T_EXT)[:, None] * spec.hop_size
            + np.arange(spec.win_size)[None, :])
    frames = wav[:, fidx] * jnp.asarray(dsp.get_window(spec.win_fn, spec.win_size))
    cos_b, sin_b = dsp.dft_bases(spec.win_size)
    re = jnp.matmul(frames, jnp.asarray(cos_b), precision=_PREC)
    im = jnp.matmul(frames, jnp.asarray(sin_b), precision=_PREC)
    power = re * re + im * im  # (N, T_EXT, F)
    filt = jnp.asarray(dsp.mel_filters(spec.sr, spec.win_size, spec.n_mels,
                                       spec.fmin, spec.fmax))
    mel = jnp.einsum("mf,ntf->nmt", filt, power, precision=_PREC)  # (N, M, T_EXT)
    mel = dsp.normalize_db(dsp.power_to_db(mel), spec.ref_db, spec.top_db, True)

    # augmentation operators, gathered per sample
    f_ops = jnp.asarray(freq_op_bank(spec.n_mels))[f_idx]   # (N, M, M)
    t_ops = jnp.asarray(time_op_bank())[t_idx]              # (N, T_EXT, T_OUT)
    feat = jnp.einsum("nom,nmt->not", f_ops, mel, precision=_PREC)
    feat = jnp.einsum("not,nty->noy", feat, t_ops, precision=_PREC)  # (N, M, 64)

    # elementwise augs
    feat = feat * feat_scale[:, :, None]
    is_row = drop_rows[:, :, None]
    zero_mode = (1.0 - drop_is_max)[:, None, None]
    feat = feat * (1.0 - is_row * zero_mode)  # zero-mode rows
    # "max" dropout mode is a silent no-op in the reference
    # (get_features.py:191-192 writes into a fancy-index copy) — reproduced
    # for parity; drop_is_max/drop_thres stay in the batch interface so the
    # knob remains observable. del to document intent:
    del drop_thres

    # deltas + channel stack → (N, T, M, 3)
    d1 = jnp.matmul(feat, jnp.asarray(dsp.delta_matrix(T_OUT, 1)), precision=_PREC)
    d2 = jnp.matmul(feat, jnp.asarray(dsp.delta_matrix(T_OUT, 2)), precision=_PREC)
    stacked = jnp.stack([feat, d1, d2], axis=-1)  # (N, M, T, 3)
    return jnp.swapaxes(stacked, 1, 2)
