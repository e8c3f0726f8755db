"""Host-side (numpy-only) feature extraction for the input pipeline.

Numpy twin of :mod:`sdfa_tpu.audio.dsp` — the dataloader must not touch JAX
(keeps workers cheap and the device free), so the mel+Δ+Δ² window features
and the train-time mel augmentations live here.

Semantics mirror the reference exactly:
- windowed_features: /root/reference/speech_anime/datasets/get_features.py:8-223
  (signal window slice + zero pad at edges, optional white noise, mel-axis
  extra/truncate rows, tremolo, cv2 INTER_LINEAR resize back, multiplicative
  sine scale, additive noise, row dropout; [feat, Δ, Δ²] channel stack; the
  ``random_args`` dict lets the adjacent window reuse identical randomness)
- mel pipeline: saber/data/audio/features/spectrogram.py (torch.stft
  center=False power → slaney mel → dB → normalize).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..audio import dsp


def mel_window(
    signal: np.ndarray,
    sr: int,
    win_size: int,
    hop_size: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    ref_db: float,
    top_db: float,
    preemphasis: float = 0.0,
    win_fn: str = "hamm",
    normalize: bool = True,
    clip_normalized: bool = True,
    subtract_mean: bool = False,
    padding: bool = False,
) -> np.ndarray:
    """(n_samples,) → (n_mels, n_frames), float32, pure numpy."""
    sig = np.asarray(signal, np.float32)
    if preemphasis:
        sig = np.append(sig[:1], sig[1:] - preemphasis * sig[:-1]).astype(np.float32)
    if padding:
        sig = np.pad(sig, (win_size // 2, win_size // 2))
    nf = 1 + (len(sig) - win_size) // hop_size
    idx = np.arange(nf)[:, None] * hop_size + np.arange(win_size)[None, :]
    frames = sig[idx] * dsp.get_window(win_fn, win_size)
    cos_b, sin_b = dsp.dft_bases(win_size)
    re = frames @ cos_b
    im = frames @ sin_b
    power = (re * re + im * im).T  # (freq, frames)
    mel = dsp.mel_filters(sr, win_size, n_mels, fmin, fmax) @ power
    mel = 10.0 * np.log10(np.maximum(mel, dsp.F32_EPS))
    if normalize:
        mel = (mel - ref_db + top_db) / top_db
        if clip_normalized:
            mel = np.clip(mel, 0.0, 1.0)
    if subtract_mean:
        mel = mel - mel.mean(axis=-1, keepdims=True)
    return mel.astype(np.float32)


def deltas_stack(feat: np.ndarray) -> np.ndarray:
    """(F, T) → (3, F, T): [feat, Δ, Δ²] via the exact delta operators."""
    t = feat.shape[-1]
    d1 = feat @ dsp.delta_matrix(t, 1)
    d2 = feat @ dsp.delta_matrix(t, 2)
    return np.stack([feat, d1, d2], axis=0).astype(np.float32)


def rms_frames(signal: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    nf = 1 + (len(signal) - frame_length) // hop_length
    idx = np.arange(nf)[:, None] * hop_length + np.arange(frame_length)[None, :]
    frames = signal[idx]
    return np.sqrt(np.mean(frames * frames, axis=-1)).astype(np.float32)


def slice_window(signal: np.ndarray, start: int, end: int) -> np.ndarray:
    """Zero-padded window slice (get_features.py:56-68)."""
    if end <= 0 or start >= len(signal):
        return np.zeros(end - start, np.float32)
    if 0 <= start and end <= len(signal):
        return np.array(signal[start:end], np.float32, copy=True)
    pad_lo = max(-start, 0)
    pad_hi = max(end - len(signal), 0)
    body = signal[max(start, 0) : min(end, len(signal))]
    return np.pad(body, (pad_lo, pad_hi)).astype(np.float32)


def windowed_features(
    signal: np.ndarray,
    signal_stt: int,
    signal_end: int,
    mel_cfg: dict,
    sr: int,
    frames: int,
    signal_noise: Optional[str] = None,
    feat_extra: Optional[Tuple[int, int]] = None,
    feat_scale: Optional[np.ndarray] = None,
    feat_noise: Optional[float] = None,
    feat_tremolo: Optional[float] = None,
    feat_dropout: Optional[float] = None,
    random_args: Optional[dict] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Window slice + augment + mel + deltas → ((3, F, T) feat, wav, random_args)."""
    rng = rng or np.random.default_rng()
    if random_args is None:
        random_args = {}
    hop_size = int(mel_cfg["hop_size"])

    ex_feat, ex_time = 0, 0
    if feat_extra is not None:
        ex_feat, ex_time = feat_extra
    wl = signal_stt - ex_time * hop_size
    wr = signal_end + ex_time * hop_size
    assert wl < wr, f"ex_time {ex_time} too large"
    wav = slice_window(signal, wl, wr)

    if isinstance(signal_noise, str):
        noise_type, noise_scale = signal_noise.split("@")
        if noise_type == "white":
            wav = wav + rng.normal(0, float(noise_scale), len(wav)).astype(np.float32)
        elif noise_type == "pink":
            from ..audio.misc import pink_noise

            wav = wav + pink_noise(len(wav), float(noise_scale), rng=rng)

    feat = mel_window(
        wav, sr=sr,
        win_size=int(mel_cfg["win_size"]), hop_size=hop_size,
        n_mels=int(mel_cfg["n_mels"]), fmin=mel_cfg["fmin"], fmax=mel_cfg["fmax"],
        ref_db=mel_cfg["ref_db"], top_db=mel_cfg["top_db"],
        preemphasis=mel_cfg.get("preemphasis", 0.0),
        win_fn=mel_cfg.get("win_fn", "hamm"),
        normalize=mel_cfg.get("normalize", True),
        clip_normalized=mel_cfg.get("clip_normalized", True),
        subtract_mean=mel_cfg.get("subtract_mean", False),
        padding=mel_cfg.get("padding", False),
    )
    n_mels = feat.shape[0]

    # --- extra/truncate mel rows (get_features.py:110-141) ---
    if feat_extra is not None:
        trunck = random_args.setdefault("trunck", bool(rng.uniform() < 0.5))
        pad_mode = random_args.setdefault("pad_mode", str(rng.choice(["reflect", "constant"])))
        lower = random_args.setdefault("lower_freq", bool(rng.uniform() < 0.5))
        if ex_feat < 0:
            feat = feat[-ex_feat:] if lower else feat[:ex_feat]
        elif ex_feat > 0:
            if lower:
                feat = np.pad(feat, [(ex_feat, 0), (0, 0)], "constant")
                if trunck:
                    feat = feat[:-ex_feat]
            else:
                feat = np.pad(feat, [(0, ex_feat), (0, 0)], pad_mode)
                if trunck:
                    feat = feat[ex_feat:]

    # --- tremolo column shifts (get_features.py:143-157) ---
    if feat_tremolo is not None and feat_tremolo > 0:
        t = feat.shape[1]
        shifting = np.abs(np.sin(np.linspace(0, 2 * np.pi, num=t) * feat_tremolo))
        shifting = (shifting * 3.0).astype(np.int32)
        cols = feat.T.copy()
        for c in range(t):
            pad = shifting[c]
            if pad > 0:
                cols[c] = np.pad(cols[c][:-pad], (pad, 0), "constant")
        feat = cols.T

    # --- resize back to (n_mels, frames) via cv2 INTER_LINEAR ---
    if feat.shape != (n_mels, frames):
        import cv2

        feat = cv2.resize(feat, (frames, n_mels), interpolation=cv2.INTER_LINEAR)

    # --- scale / noise / dropout (get_features.py:166-192) ---
    if feat_scale is not None:
        feat = feat * feat_scale
    if feat_noise is not None and feat_noise > 0:
        feat = feat + rng.normal(0.0, feat_noise, size=feat.shape)
    if feat_dropout is not None and feat_dropout > 0:
        mask_len = max(1, int(feat_dropout * n_mels))
        mask_idx = random_args.get("mask_idx")
        if mask_idx is None:
            mask_idx = rng.choice(np.arange(n_mels), mask_len)
        drop_mode = random_args.setdefault("drop_mode", str(rng.choice(["zero", "max"])))
        mask_thres = random_args.setdefault("mask_thres", float(rng.uniform(0.3, 0.6)))
        random_args["mask_idx"] = mask_idx
        if drop_mode == "zero":
            feat[mask_idx] = 0
        # "max" mode: the reference's `feat[mask_idx][where] = mask_thres`
        # (get_features.py:191-192) assigns into a fancy-index COPY — a
        # silent no-op. Reproduced as a no-op for strict parity of the
        # training augmentation distribution (ADVICE r1; PARITY.md A24).

    stacked = deltas_stack(feat.astype(np.float32))
    return stacked, wav, random_args
