"""Audio DSP primitives, numerically matching the reference frontend.

Reference semantics reproduced here (file:line cites into /root/reference):
- preemphasis: ``saber/data/audio/features/misc.py:8-20``
- symmetric hamming/hanning windows (``np.hamming``): ``misc.py:94-106``
- STFT power with ``center=False`` torch.stft semantics:
  ``saber/data/audio/features/spectrogram.py:85-104``
- mel filterbank = librosa slaney-norm filters: ``misc.py:109-121``
- power→dB (10·log10, eps=float32 eps) and dB normalization
  ((db−ref+top)/top clip [0,1]): ``spectrogram.py:236-258``
- delta features = librosa.feature.delta (Savitzky-Golay width 9,
  mode='interp'): ``speech_anime/datasets/get_features.py:196-214``

TPU-first design notes:
- The 512-point real DFT is computed as two fp32 matmuls against cos/sin
  bases — MXU-friendly and exactly reproducible, unlike vendor FFTs.
- librosa's delta (including its 'interp' edge handling) is a *linear*
  operator along time; we materialize it once as a (T, T) matrix with scipy
  and apply it as a matmul on device.
- Everything below is pure / jittable; constants are numpy, runtime ops jnp.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

F32_EPS = float(np.finfo(np.float32).eps)
_PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def get_window(win_fn: str, win_size: int) -> np.ndarray:
    """Symmetric numpy windows, as the reference uses (misc.py:94-106)."""
    names = {"hamm": "hamming", "hann": "hanning", "hamming": "hamming",
             "hanning": "hanning", "ones": "ones"}
    assert win_fn in names, f"unknown window: {win_fn}"
    return getattr(np, names[win_fn])(win_size).astype(np.float32)


# ---------------------------------------------------------------------------
# preemphasis
# ---------------------------------------------------------------------------
def preemphasis(signal, a: float = 0.0):
    if a is None or a == 0:
        return signal
    if isinstance(signal, np.ndarray):
        return np.append(signal[:1], signal[1:] - a * signal[:-1]).astype(signal.dtype)
    return jnp.concatenate([signal[..., :1], signal[..., 1:] - a * signal[..., :-1]], axis=-1)


def deemphasis(signal: np.ndarray, a: float = 0.0) -> np.ndarray:
    if a is None or a == 0:
        return signal
    out = np.array(signal, dtype=np.float64)
    for i in range(1, len(out)):
        out[i] += out[i - 1] * a
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------------
def num_frames(n_samples: int, win_size: int, hop_size: int) -> int:
    """torch.stft(center=False) frame count."""
    return 1 + (n_samples - win_size) // hop_size


def frame_signal(signal: jnp.ndarray, win_size: int, hop_size: int) -> jnp.ndarray:
    """(..., n_samples) → (..., n_frames, win_size); no padding (center=False)."""
    n = signal.shape[-1]
    nf = num_frames(n, win_size, hop_size)
    idx = (np.arange(nf)[:, None] * hop_size + np.arange(win_size)[None, :])
    return signal[..., idx]


# ---------------------------------------------------------------------------
# DFT-as-matmul real power spectrum
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def dft_bases(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """(n_fft, n_fft//2+1) cos/-sin bases for the onesided real DFT."""
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(n_fft // 2 + 1)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def stft_power(
    signal: jnp.ndarray,
    win_size: int,
    hop_size: int,
    win_fn: str = "hamm",
    padding: bool = False,
) -> jnp.ndarray:
    """Power spectrogram (..., n_freq, n_frames) with torch.stft semantics.

    ``padding=True`` reproduces torch.stft(center=True, pad_mode='constant').
    """
    if padding:
        pad = [(0, 0)] * (signal.ndim - 1) + [(win_size // 2, win_size // 2)]
        signal = jnp.pad(signal, pad)
    frames = frame_signal(signal, win_size, hop_size)
    window = jnp.asarray(get_window(win_fn, win_size))
    frames = frames * window
    cos_b, sin_b = dft_bases(win_size)
    re = jnp.matmul(frames, jnp.asarray(cos_b), precision=_PREC)
    im = jnp.matmul(frames, jnp.asarray(sin_b), precision=_PREC)
    power = re * re + im * im
    return jnp.swapaxes(power, -1, -2)  # (..., n_freq, n_frames)


# ---------------------------------------------------------------------------
# mel filterbank (librosa-compatible: htk=False, norm='slaney')
# ---------------------------------------------------------------------------
def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz, min_log_mel + np.log(freq / min_log_hz) / logstep, mels)


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@functools.lru_cache(maxsize=None)
def mel_filters(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) slaney-normalized triangular filterbank."""
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)), n_mels + 2)
    mel_f = _mel_to_hz(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# dB scaling
# ---------------------------------------------------------------------------
def power_to_db(power: jnp.ndarray) -> jnp.ndarray:
    return 10.0 * jnp.log10(jnp.maximum(power, F32_EPS))


def db_to_power(db: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, 0.1 * db)


def normalize_db(db, ref_db: float, top_db: float, clip: bool = True):
    out = (db - ref_db + top_db) / top_db
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def denormalize_db(norm_db, ref_db: float, top_db: float):
    return norm_db * top_db - top_db + ref_db


# ---------------------------------------------------------------------------
# full mel pipeline
# ---------------------------------------------------------------------------
def mel_spectrogram(
    signal: jnp.ndarray,
    sr: int,
    win_size: int,
    hop_size: int,
    win_fn: str = "hamm",
    padding: bool = False,
    n_mels: int = 80,
    fmin: float = 25.0,
    fmax: float = 7600.0,
    ref_db: float = 20.0,
    top_db: float = 100.0,
    normalize: bool = False,
    clip_normalized: bool = True,
    subtract_mean: bool = False,
    preemph: float = 0.0,
) -> jnp.ndarray:
    """(..., n_samples) → (..., n_mels, n_frames), matching the reference."""
    signal = preemphasis(signal, preemph)
    power = stft_power(signal, win_size, hop_size, win_fn, padding)
    filt = jnp.asarray(mel_filters(sr, win_size, n_mels, fmin, fmax))
    mel = jnp.matmul(filt, power, precision=_PREC)
    mel = power_to_db(mel)
    if normalize:
        mel = normalize_db(mel, ref_db, top_db, clip_normalized)
    if subtract_mean:
        mel = mel - jnp.mean(mel, axis=-1, keepdims=True)
    return mel


def spectrogram(
    signal: jnp.ndarray,
    sr: int,
    win_size: int,
    hop_size: int,
    win_fn: str = "hamm",
    padding: bool = False,
    ref_db: float = 20.0,
    top_db: float = 100.0,
    normalize: bool = False,
    clip_normalized: bool = True,
    subtract_mean: bool = False,
    preemph: float = 0.0,
) -> jnp.ndarray:
    signal = preemphasis(signal, preemph)
    power = stft_power(signal, win_size, hop_size, win_fn, padding)
    lin = power_to_db(power)
    if normalize:
        lin = normalize_db(lin, ref_db, top_db, clip_normalized)
    if subtract_mean:
        lin = lin - jnp.mean(lin, axis=-1, keepdims=True)
    return lin


# ---------------------------------------------------------------------------
# delta features (librosa.feature.delta equivalents)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def delta_matrix(n_frames: int, order: int, width: int = 9) -> np.ndarray:
    """(T, T) operator R with ``delta(feat) == feat @ R``.

    librosa.feature.delta(data, order=k) is scipy.signal.savgol_filter(data,
    width, polyorder=k, deriv=k, mode='interp') along time — a linear map, so
    applying it to the identity gives the exact operator incl. edge handling.
    """
    from scipy.signal import savgol_filter

    eye = np.eye(n_frames, dtype=np.float64)
    resp = savgol_filter(eye, width, polyorder=order, deriv=order, axis=-1, mode="interp")
    # resp[s, t] = delta(e_s)[t]; out[f, t] = sum_s feat[f, s] resp[s, t]
    return resp.astype(np.float32)


def delta(feat: jnp.ndarray, order: int = 1, width: int = 9) -> jnp.ndarray:
    """Delta along the last (time) axis; feat (..., F, T)."""
    mat = jnp.asarray(delta_matrix(feat.shape[-1], order, width))
    return jnp.matmul(feat, mat, precision=_PREC)


def add_deltas(feat: jnp.ndarray) -> jnp.ndarray:
    """(..., F, T) → (..., 3, F, T) stacking [feat, Δ, Δ²] as channels
    (reference: get_features.py:196-214)."""
    t = feat.shape[-1]
    d1 = jnp.matmul(feat, jnp.asarray(delta_matrix(t, 1)), precision=_PREC)
    d2 = jnp.matmul(feat, jnp.asarray(delta_matrix(t, 2)), precision=_PREC)
    return jnp.stack([feat, d1, d2], axis=-3)


# ---------------------------------------------------------------------------
# inverse spectrograms (Griffin-Lim; reference spectrogram.py:46-62,106-131)
# ---------------------------------------------------------------------------
def _istft(spec: np.ndarray, win_size: int, hop_size: int, win_fn: str) -> np.ndarray:
    """Overlap-add inverse of the centered STFT (host-side numpy)."""
    window = get_window(win_fn, win_size).astype(np.float64)
    n_frames = spec.shape[1]
    out = np.zeros(win_size + hop_size * (n_frames - 1))
    wsum = np.zeros_like(out)
    frames = np.fft.irfft(spec, n=win_size, axis=0).T  # (frames, win)
    for i in range(n_frames):
        out[i * hop_size : i * hop_size + win_size] += frames[i] * window
        wsum[i * hop_size : i * hop_size + win_size] += window**2
    nz = wsum > 1e-10
    out[nz] /= wsum[nz]
    return out[win_size // 2 : -(win_size // 2)]


def griffin_lim(
    magnitude: np.ndarray,
    win_size: int,
    hop_size: int,
    win_fn: str = "hamm",
    n_iter: int = 50,
    seed: int = 0,
) -> np.ndarray:
    """Phase reconstruction from a magnitude spectrogram (freq, frames)."""
    rng = np.random.default_rng(seed)
    angles = np.exp(2j * np.pi * rng.random(magnitude.shape))
    mag = np.abs(magnitude).astype(np.float64)
    window = get_window(win_fn, win_size).astype(np.float64)
    for _ in range(n_iter):
        signal = _istft(mag * angles, win_size, hop_size, win_fn)
        padded = np.pad(signal, (win_size // 2, win_size // 2))
        nf = num_frames(len(padded), win_size, hop_size)
        idx = np.arange(nf)[:, None] * hop_size + np.arange(win_size)[None, :]
        rebuilt = np.fft.rfft(padded[idx] * window, axis=1).T
        rebuilt = rebuilt[:, : mag.shape[1]]
        angles = np.exp(1j * np.angle(rebuilt))
    return _istft(mag * angles, win_size, hop_size, win_fn).astype(np.float32)


def inv_spectrogram(
    spec, sr, win_size, hop_size, win_fn="hamm", ref_db=20, top_db=100,
    normalize=False, n_iter=50, preemph=0.0,
):
    """Normalized-dB power spectrogram → waveform."""
    db = np.asarray(spec, np.float64)
    if normalize:
        db = db * top_db - top_db + ref_db
    amp = np.sqrt(np.power(10.0, 0.1 * db))
    wav = griffin_lim(amp, win_size, hop_size, win_fn, n_iter)
    return deemphasis(wav, preemph)


def inv_mel_spectrogram(
    mel, sr, win_size, hop_size, win_fn="hamm", n_mels=80, fmin=25, fmax=7600,
    ref_db=20, top_db=100, normalize=False, n_iter=50, preemph=0.0,
):
    """Normalized-dB mel → waveform via pinv mel filters + Griffin-Lim."""
    db = np.asarray(mel, np.float64)
    if normalize:
        db = db * top_db - top_db + ref_db
    power = np.power(10.0, 0.1 * db)
    inv_filt = np.linalg.pinv(mel_filters(sr, win_size, n_mels, fmin, fmax))
    lin_power = np.maximum(inv_filt @ power, 1e-10)
    wav = griffin_lim(np.sqrt(lin_power), win_size, hop_size, win_fn, n_iter)
    return deemphasis(wav, preemph)


# ---------------------------------------------------------------------------
# phase-vocoder time stretch + pitch shift (host-side numpy)
#
# The reference's source augmentation selects pitch-shifted blob variants
# produced with librosa.effects.pitch_shift (±2/±4 semitones; generation
# commented out upstream at preload.py:702-730 but the selection path at
# sliding_window.py:140-147 consumes them). librosa is not in this image:
# this is the same algorithm — phase-vocoder time stretch, then polyphase
# resampling back to the original duration.
# ---------------------------------------------------------------------------
def phase_vocoder(spec: np.ndarray, rate: float, hop_size: int) -> np.ndarray:
    """Stretch a complex STFT (freq, frames) by ``rate`` (librosa semantics:
    rate > 1 speeds up / fewer frames). Magnitudes are linearly interpolated
    between columns; phases advance by the accumulated instantaneous
    frequency so sinusoid continuity is preserved."""
    n_bins, n_frames = spec.shape
    time_steps = np.arange(0, n_frames, rate)
    phi_advance = np.linspace(0, np.pi * hop_size, n_bins)
    padded = np.pad(spec, ((0, 0), (0, 2)))
    out = np.zeros((n_bins, len(time_steps)), np.complex128)
    phase_acc = np.angle(spec[:, 0])
    for t, step in enumerate(time_steps):
        i = int(step)
        alpha = step - i
        c0, c1 = padded[:, i], padded[:, i + 1]
        mag = (1.0 - alpha) * np.abs(c0) + alpha * np.abs(c1)
        out[:, t] = mag * np.exp(1j * phase_acc)
        dphase = np.angle(c1) - np.angle(c0) - phi_advance
        dphase -= 2.0 * np.pi * np.round(dphase / (2.0 * np.pi))
        phase_acc = phase_acc + phi_advance + dphase
    return out


def time_stretch(signal: np.ndarray, rate: float, win_size: int = 1024,
                 hop_size: int = 256, win_fn: str = "hann") -> np.ndarray:
    """Stretch ``signal`` to duration len/rate at the same pitch."""
    assert rate > 0
    y = np.asarray(signal, np.float64)
    window = get_window(win_fn, win_size).astype(np.float64)
    padded = np.pad(y, (win_size // 2, win_size // 2), mode="reflect")
    nf = num_frames(len(padded), win_size, hop_size)
    idx = np.arange(nf)[:, None] * hop_size + np.arange(win_size)[None, :]
    spec = np.fft.rfft(padded[idx] * window, axis=1).T  # (freq, frames)
    out = _istft(phase_vocoder(spec, rate, hop_size), win_size, hop_size, win_fn)
    n_out = int(round(len(y) / rate))
    if len(out) < n_out:
        out = np.pad(out, (0, n_out - len(out)))
    return out[:n_out].astype(np.float32)


def pitch_shift(signal: np.ndarray, sr: int, n_steps: float,
                bins_per_octave: int = 12) -> np.ndarray:
    """Shift pitch by ``n_steps`` semitones, duration preserved
    (librosa.effects.pitch_shift algorithm: stretch by 2^(−n/12), then
    resample the stretched signal back to the original length)."""
    from fractions import Fraction

    from scipy.signal import resample_poly

    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    stretched = time_stretch(signal, rate)
    frac = Fraction(rate).limit_denominator(1000)
    out = resample_poly(stretched.astype(np.float64),
                        frac.numerator, frac.denominator)
    n = len(np.asarray(signal))
    if len(out) < n:
        out = np.pad(out, (0, n - len(out)))
    return out[:n].astype(np.float32)


# ---------------------------------------------------------------------------
# RMS energy (librosa.feature.rms(center=False) parity)
# ---------------------------------------------------------------------------
def rms_energy(signal: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    frames = frame_signal(signal, frame_length, hop_length)
    return jnp.sqrt(jnp.mean(frames * frames, axis=-1))


# ---------------------------------------------------------------------------
# resampling (polyphase; for io-time source preparation, host side)
# ---------------------------------------------------------------------------
def resample(signal: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return np.asarray(signal, dtype=np.float32)
    from scipy.signal import resample_poly

    g = math.gcd(int(orig_sr), int(target_sr))
    out = resample_poly(np.asarray(signal, dtype=np.float64), target_sr // g, orig_sr // g)
    return out.astype(np.float32)
