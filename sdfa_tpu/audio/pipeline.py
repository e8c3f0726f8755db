"""Fused on-device inference frontend: wav → all sliding-window features.

The reference recomputes the mel frontend per overlapping window on CPU
(98.6% overlap; SURVEY.md §6 "Audio frontend cost").  Here the whole clip's
windows are featurized in ONE jitted program: window gather → framing →
DFT-matmul power spectrum → mel → dB → normalize → Δ/Δ² matmuls, batched
over (windows × frames) — everything MXU/VPU-shaped, zero host round trips.

Window geometry matches DatasetSlidingWindow.fetch_audio_features
(/root/reference/speech_anime/datasets/sliding_window.py:320-377): one
center-aligned, zero-padded window per 60 fps output frame,
ts = center − ts_delta.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import ConfigDict
from . import dsp

from ..nn.precision import OPS_PREC as _PREC


class WindowSpec:
    """Static geometry for a clip length (hashable jit key)."""

    def __init__(self, hparams: ConfigDict):
        feat_cfg = hparams.audio.feature
        mel_cfg = dict(hparams.audio[feat_cfg.name])
        sr = int(hparams.audio.sample_rate)
        for key in ("win_size", "hop_size"):
            if isinstance(mel_cfg[key], float):
                mel_cfg[key] = int(mel_cfg[key] * sr)
        self.sr = sr
        self.win_size = int(mel_cfg["win_size"])
        self.hop_size = int(mel_cfg["hop_size"])
        self.n_mels = int(mel_cfg["n_mels"])
        self.fmin = float(mel_cfg["fmin"])
        self.fmax = float(mel_cfg["fmax"])
        self.ref_db = float(mel_cfg["ref_db"])
        self.top_db = float(mel_cfg["top_db"])
        self.preemph = float(mel_cfg.get("preemphasis", 0.0) or 0.0)
        self.win_fn = mel_cfg.get("win_fn", "hamm")
        self.normalize = bool(mel_cfg.get("normalize", True))
        self.clip = bool(mel_cfg.get("clip_normalized", True))
        self.frames = int(feat_cfg.sliding_window_frames)
        self.fps = float(hparams.anime.fps)
        self.ts_delta = float(hparams.anime.feature.ts_delta)
        self.sliding = self.hop_size * (self.frames - 1) + self.win_size

    def window_geom(self, w: int) -> Tuple[int, int]:
        """(start_sample, ts_ms) of the w-th output window (w >= 0) —
        the single source of the per-window arithmetic, shared by the
        offline paths and streaming.StreamingSession."""
        m = math.floor((w - 1.0) * self.sr / self.fps)
        e = m + self.sliding // 2
        s = e - self.sliding
        ts = int(round((s + e) / 2 * 1000.0 / self.sr - self.ts_delta))
        return s, ts

    def n_windows(self, n_samples: int) -> int:
        """Window count for a clip length — closed form of the reference
        loop condition ``(w-1)·sr/fps + sliding <= n + 2·sliding``, locally
        adjusted with the exact float comparison so edge cases match the
        iterative loop bit-for-bit."""
        def ok(w):
            return (w - 1.0) * self.sr / self.fps + self.sliding \
                <= n_samples + 2 * self.sliding
        w = max(0, int((n_samples + self.sliding) * self.fps / self.sr) - 1)
        while not ok(w) and w > 0:
            w -= 1
        while ok(w):
            w += 1
        return w

    def window_starts(self, n_samples: int) -> Tuple[np.ndarray, list]:
        """Start sample (into the original signal) + ts list per 60fps frame."""
        n = self.n_windows(n_samples)
        geo = [self.window_geom(w) for w in range(n)]
        starts = [g[0] for g in geo]
        ts_list = [g[1] for g in geo]
        return np.asarray(starts, np.int32), ts_list

    # -- window-overlap fast path geometry --------------------------------
    def frame_grid(self, n_samples: int, bucket: int = 0):
        """Clip-level hop-grid geometry for the overlap fast path.

        Adjacent sliding windows overlap by 98.6% (window 4544 samples,
        stride sr/fps ≈ 133); recomputing the frontend + per-frame encoder
        per window is ~30× redundant work. Instead the clip is framed ONCE
        at hop resolution and each window gathers its 64 frames from that
        grid, with the window start snapped to the nearest hop multiple
        (≤ hop/2 = 32 samples = 4 ms shift — far inside the reference's own
        ±0.5-frame train-time jitter, sliding_window.py:42,85-88).

        Returns (frame_idx (W, frames) int32 into the clip frame grid,
        ts_list, pad_left, pad_right, t_total).

        ``bucket`` > 0 rounds t_total up to a bucket multiple (by extending
        the zero right-pad — semantically the same trailing silence the
        per-window path zero-pads with), so jit shapes recompile per length
        bucket instead of per clip length.
        """
        assert self.sliding % self.hop_size == 0, (
            "overlap fast path needs the window span to be a hop multiple"
        )
        starts, ts_list = self.window_starts(n_samples)
        snapped = np.round(starts / self.hop_size).astype(np.int64) * self.hop_size
        pad = self.sliding  # covers the most-negative start (= -sliding//2)
        f0 = (snapped + pad) // self.hop_size
        frame_idx = (f0[:, None] + np.arange(self.frames)[None, :]).astype(np.int32)
        need = int(frame_idx.max()) + 1
        # right pad so the padded signal yields >= `need` + 4 frames: the
        # +4 keeps every GATHERED frame interior to the 9-tap Savitzky-
        # Golay delta kernel, so delta_matrix never applies its right-edge
        # fits to a frame a window actually reads. Without the slack, a
        # clip whose t_total lands exactly on the bucket boundary would
        # give the last <=4 emitted frames edge-fit deltas offline while
        # streaming (interior taps over the zero-extended mel) diverges
        # beyond fp tolerance (ADVICE r2 #1).
        n_min = self.win_size + self.hop_size * (need + 4 - 1)
        pad_right = max(pad, n_min - n_samples - pad)
        t_total = 1 + (n_samples + pad + pad_right - self.win_size) // self.hop_size
        if bucket and t_total % bucket:
            grow = bucket - t_total % bucket
            t_total += grow
            pad_right += grow * self.hop_size
        return frame_idx, ts_list, pad, pad_right, int(t_total)



def mel_from_frames(frames: jnp.ndarray, spec: WindowSpec) -> jnp.ndarray:
    """Framed signal (..., T, win) → normalized mel-dB (..., T, M).

    The ONE copy of the window→DFT→power→mel→dB→normalize math shared by
    the offline clip path, the per-window exact path, and the streaming
    fused block (task._get_stream_fns) — a frontend tweak (e.g. the
    HIGHEST-precision pin) lands everywhere at once."""
    frames = frames * jnp.asarray(dsp.get_window(spec.win_fn, spec.win_size))
    cos_b, sin_b = dsp.dft_bases(spec.win_size)
    re = jnp.matmul(frames, jnp.asarray(cos_b), precision=_PREC)
    im = jnp.matmul(frames, jnp.asarray(sin_b), precision=_PREC)
    power = re * re + im * im
    filt = jnp.asarray(dsp.mel_filters(spec.sr, spec.win_size, spec.n_mels,
                                       spec.fmin, spec.fmax))
    mel = jnp.matmul(power, filt.T, precision=_PREC)
    mel = dsp.power_to_db(mel)
    if spec.normalize:
        mel = dsp.normalize_db(mel, spec.ref_db, spec.top_db, spec.clip)
    return mel


@functools.partial(jax.jit, static_argnames=("spec",))
def clip_frame_features_padded(padded: jnp.ndarray, spec: WindowSpec) -> jnp.ndarray:
    """Pre-padded signal (n + pad_left + pad_right,) → clip-level features
    (T_total, F, 3) on the hop grid.

    Padding happens outside so callers can bucket the padded length — the
    jit then recompiles per bucket, not per clip length.

    Same mel+Δ+Δ² math as window_features_device but computed once per clip
    instead of per window. Known bounded divergences from the per-window
    path (tests/test_overlap_path.py): preemphasis is clip-continuous
    (per-window mode leaves each window's first sample unfiltered) and
    Δ/Δ² see true neighbors at window edges instead of the window-local
    Savitzky-Golay edge fit.
    """
    if spec.preemph:
        padded = dsp.preemphasis(padded, spec.preemph)
    frames = dsp.frame_signal(padded, spec.win_size, spec.hop_size)
    mel = mel_from_frames(frames, spec)  # (T, M)
    feat = mel.T  # (M, T)
    d1 = jnp.matmul(feat, jnp.asarray(dsp.delta_matrix(feat.shape[-1], 1)),
                    precision=_PREC)
    d2 = jnp.matmul(feat, jnp.asarray(dsp.delta_matrix(feat.shape[-1], 2)),
                    precision=_PREC)
    stacked = jnp.stack([feat, d1, d2], axis=-1)  # (M, T, 3)
    return jnp.swapaxes(stacked, 0, 1)  # (T, M, 3)


def clip_frame_features_device(
    signal: jnp.ndarray, spec: WindowSpec, pad_left: int, pad_right: int
) -> jnp.ndarray:
    """signal (S,) → clip-level features (T_total, F, 3); pads then runs
    clip_frame_features_padded (composable inside larger jits)."""
    return clip_frame_features_padded(jnp.pad(signal, (pad_left, pad_right)), spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def window_features_device(
    signal: jnp.ndarray, starts: jnp.ndarray, spec: WindowSpec
) -> jnp.ndarray:
    """signal (S,), starts (W,) → features (W, T, F, 3)."""
    pad = spec.sliding
    padded = jnp.pad(signal, (pad, pad))
    # gather windows: (W, sliding)
    idx = (starts + pad)[:, None] + jnp.arange(spec.sliding)[None, :]
    wav = padded[idx]
    if spec.preemph:
        wav = jnp.concatenate(
            [wav[:, :1], wav[:, 1:] - spec.preemph * wav[:, :-1]], axis=1
        )
    # framing: (W, T, win)
    fidx = np.arange(spec.frames)[:, None] * spec.hop_size + np.arange(spec.win_size)[None, :]
    mel = mel_from_frames(wav[:, fidx], spec)  # (W, T, M)
    # deltas along T: mel (W, T, M) → need ops along T axis
    feat = jnp.swapaxes(mel, 1, 2)  # (W, M, T)
    d1 = jnp.matmul(feat, jnp.asarray(dsp.delta_matrix(spec.frames, 1)), precision=_PREC)
    d2 = jnp.matmul(feat, jnp.asarray(dsp.delta_matrix(spec.frames, 2)), precision=_PREC)
    stacked = jnp.stack([feat, d1, d2], axis=-1)  # (W, M, T, 3)
    return jnp.swapaxes(stacked, 1, 2)  # (W, T, M, 3)


def fetch_audio_features_device(signal: np.ndarray, hparams: ConfigDict) -> Dict:
    """Device twin of DatasetSlidingWindow.fetch_audio_features."""
    spec = _spec_cache(hparams)
    starts, ts_list = spec.window_starts(len(signal))
    feats = window_features_device(jnp.asarray(signal, jnp.float32),
                                   jnp.asarray(starts), spec)
    energy = dsp.rms_energy(
        jnp.pad(jnp.asarray(signal, jnp.float32), (spec.sliding, spec.sliding))[
            (starts[:, None] + spec.sliding) + np.arange(spec.sliding)[None, :]
        ],
        spec.win_size, spec.hop_size,
    )
    return dict(tslist=ts_list, audio_feat=feats, energy=energy)


_SPEC_CACHE: Dict[int, WindowSpec] = {}


def _spec_cache(hparams: ConfigDict) -> WindowSpec:
    key = id(hparams)
    if key not in _SPEC_CACHE:
        _SPEC_CACHE[key] = WindowSpec(hparams)
    return _SPEC_CACHE[key]
