"""Noise generators, mu-law companding, and an energy-based VAD.

Reference surfaces: saber/data/audio/noise.py:4-33 (white + Voss-McCartney
pink noise), saber/data/audio/mu.py:11-51 (companding),
saber/data/audio/vad.py:6-80 (speech detection; the reference uses webrtcvad
which only matters for offline preprocessing — here an energy VAD with the
same 20 ms framing and run-length smoothing/pair API).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


# -- noise -------------------------------------------------------------------
def white_noise(length: int, scale: float = 1.0, rng: Optional[np.random.Generator] = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    return rng.normal(0.0, scale, int(length)).astype(np.float32)


def pink_noise(nrows: int, scale: float = 1.0, ncols: int = 16,
               rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Voss-McCartney pink noise (row-wise forward-fill of sparse updates)."""
    rng = rng or np.random.default_rng()
    array = np.full((nrows, ncols), np.nan)
    array[0, :] = rng.random(ncols)
    array[:, 0] = rng.random(nrows)
    cols = rng.geometric(0.5, nrows)
    cols[cols >= ncols] = 0
    rows = rng.integers(0, nrows, size=nrows)
    array[rows, cols] = rng.random(nrows)
    # forward-fill along axis 0 without pandas
    mask = np.isnan(array)
    idx = np.where(mask, 0, np.arange(nrows)[:, None])
    np.maximum.accumulate(idx, axis=0, out=idx)
    filled = array[idx, np.arange(ncols)[None, :]]
    filled = np.where(np.isnan(filled), 0.0, filled)
    return (filled.sum(axis=1) * scale).astype(np.float32)


# -- mu-law ------------------------------------------------------------------
def mulaw(y, nb_mu):
    mu = float(nb_mu)
    return np.sign(y) * np.log1p(np.abs(y) * mu) / np.log1p(mu)


def inv_mulaw(y, nb_mu):
    mu = float(nb_mu)
    return np.sign(y) * (1.0 / mu) * ((1.0 + mu) ** np.abs(y) - 1.0)


def mu_quantize(y, nb_mu):
    return ((np.asarray(y) + 1.0) * float(nb_mu) / 2.0).astype(np.int64)


def mu_normalize(y, nb_mu):
    return np.asarray(y, np.float32) * 2.0 / float(nb_mu) - 1.0


# -- VAD ----------------------------------------------------------------------
def detect_speech(
    signal: np.ndarray,
    sr: int,
    pad_mode: str = "constant",
    smooth_ms: Optional[float] = None,
    energy_db_threshold: float = -40.0,
) -> np.ndarray:
    """Per-20ms-frame speech flags (uint8), energy-based."""
    win_len = int(0.02 * sr)
    hop_len = win_len
    stops = range(0, max(len(signal) - win_len, 0), hop_len)
    flags = []
    for left in stops:
        frame = signal[left : left + win_len]
        rms = np.sqrt(np.mean(frame.astype(np.float64) ** 2) + 1e-12)
        flags.append(1 if 20.0 * np.log10(max(rms, 1e-10)) > energy_db_threshold else 0)
    is_speech = np.asarray(flags, np.uint8)
    if smooth_ms is not None and len(is_speech):
        # suppress runs shorter than smooth_ms/2.5 frames (reference heuristic)
        threshold = smooth_ms / 2.5
        i = 0
        out = is_speech.copy()
        while i < len(out):
            j = i
            while j < len(out) and out[j] == out[i]:
                j += 1
            if (j - i) < threshold and i > 0:
                out[i:j] = out[i - 1]
            i = j
        is_speech = out
    return is_speech


def vad_to_pairs(is_speech: np.ndarray) -> List[Tuple[int, int]]:
    pairs = []
    i = 0
    while i < len(is_speech):
        if is_speech[i]:
            j = i
            while j < len(is_speech) and is_speech[j]:
                j += 1
            pairs.append((i, j))
            i = j
        else:
            i += 1
    return pairs


def vad_from_pairs(pairs, length: int) -> np.ndarray:
    out = np.zeros(length, np.uint8)
    for s, e in pairs:
        out[s:e] = 1
    return out
