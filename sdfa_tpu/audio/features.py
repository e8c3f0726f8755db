"""Feature registry (reference: saber/data/audio/features/__init__.py:13-73).

name → function map covering the reference names; ``get_dict`` drives
extraction from a ConfigDict with per-feature arg sub-dicts.  All features run
through the jittable DSP in :mod:`sdfa_tpu.audio.dsp` and return numpy for
host callers; batched device callers use :func:`sdfa_tpu.audio.dsp` directly.
"""

from __future__ import annotations

from typing import Dict, Iterable

import numpy as np

from ..utils.config import ConfigDict
from . import dsp


def _mel(signal, sr, **kw):
    kw = dict(kw)
    kw.pop("sr", None)
    preemph = kw.pop("preemphasis", 0.0)
    return np.asarray(
        dsp.mel_spectrogram(np.asarray(signal, np.float32), sr=sr, preemph=preemph, **kw)
    )


def _spec(signal, sr, **kw):
    kw = dict(kw)
    kw.pop("sr", None)
    preemph = kw.pop("preemphasis", 0.0)
    return np.asarray(
        dsp.spectrogram(np.asarray(signal, np.float32), sr=sr, preemph=preemph, **kw)
    )


def _lpc(signal, sr, order=32, win_size=None, hop_size=None, win_fn="hamm",
         preemphasis=0.65, **kw):
    """LPC per frame via autocorrelation + Levinson-Durbin (reference uses
    pysptk, saber/data/audio/features/lpc.py:7-77; zero-fallback on failure)."""
    signal = dsp.preemphasis(np.asarray(signal, np.float64), preemphasis)
    frames = np.asarray(dsp.frame_signal(signal, int(win_size), int(hop_size)))
    window = dsp.get_window(win_fn, int(win_size)).astype(np.float64)
    frames = frames * window
    out = np.zeros((len(frames), order + 1), np.float32)
    for i, frame in enumerate(frames):
        try:
            r = np.correlate(frame, frame, mode="full")[len(frame) - 1 : len(frame) + order]
            if r[0] <= 0:
                continue
            a = np.zeros(order + 1)
            a[0] = 1.0
            err = r[0]
            for k in range(1, order + 1):
                acc = r[k] + np.dot(a[1:k], r[1:k][::-1])
                lam = -acc / err
                a[1 : k + 1] += lam * a[:k][::-1]
                err *= 1.0 - lam * lam
                if err <= 0:
                    raise FloatingPointError
            out[i, 0] = np.log(np.sqrt(max(err, 1e-12)))
            out[i, 1:] = a[1:]
        except FloatingPointError:
            out[i] = 0.0
    return out.T  # (order+1, frames)


def _deepspeech_spec(signal, sr, win_size, hop_size, win_fn="hann",
                     padding=False, normalize=False, preemphasis=0, **kw):
    """log1p magnitude spectrogram (reference features/others.py:6-28)."""
    sig = np.asarray(signal, np.float32)
    if preemphasis:
        sig = np.append(sig[:1], sig[1:] - preemphasis * sig[:-1]).astype(np.float32)
    power = np.asarray(dsp.stft_power(sig, int(win_size), int(hop_size), win_fn, padding))
    mag = np.sqrt(np.maximum(power, 0.0))
    if normalize:
        raise NotImplementedError("normalize is NotImplemented upstream too")
    return np.log1p(mag).astype(np.float32)


__support__ = {
    "lpc": _lpc,
    "mel": _mel,
    "mag": _spec,
    "spec": _spec,
    "linear": _spec,
    "spectrogram": _spec,
    "deepspeech_spec": _deepspeech_spec,
}


def get(name: str, signal, sr: int, **kwargs) -> np.ndarray:
    assert name in __support__, f"'{name}' is not supported!"
    kwargs.pop("sr", None)
    return __support__[name](signal, sr, **kwargs)


def size(name: str, args: dict) -> int:
    if name == "lpc":
        return int(args["order"]) + 1
    if name in ("mag", "spec", "linear", "spectrogram", "deepspeech_spec"):
        return int(args["win_size"]) // 2 + 1
    if name == "mel":
        return int(args.get("n_mels", 80))
    raise NotImplementedError(name)


def get_dict(name_list: Iterable[str], signal, args_dict) -> Dict[str, np.ndarray]:
    if not isinstance(args_dict, ConfigDict):
        args_dict = ConfigDict(args_dict)
    ret = {}
    for name in name_list:
        assert name in __support__, f"'{name}' is not supported!"
        args = args_dict.get(name)
        if args is None:
            raise KeyError(f"audio config has no arg sub-dict for feature '{name}'")
        args = dict(args)
        ret[name] = get(name, signal, int(args_dict["sample_rate"]), **args)
    return ret
