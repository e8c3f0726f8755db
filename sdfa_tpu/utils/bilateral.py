"""1-D bilateral smoothing of vertex sequences.

Reference: saber/utils/bilateral.py:6-74 (BilateralFilter1D).  Vectorized:
for each time step, neighbors within the window are weighted by a spatial
gaussian × a range gaussian on value distance.
"""

from __future__ import annotations

import numpy as np


class BilateralFilter1D:
    def __init__(self, radius: int = 3, sigma_space: float = 2.0, sigma_value: float = 0.01):
        self.radius = int(radius)
        self.sigma_space = float(sigma_space)
        self.sigma_value = float(sigma_value)
        offs = np.arange(-self.radius, self.radius + 1)
        self._space_w = np.exp(-(offs**2) / (2 * self.sigma_space**2))
        self._offs = offs

    def __call__(self, seq: np.ndarray) -> np.ndarray:
        """(T, ...) → smoothed (T, ...)."""
        seq = np.asarray(seq, np.float64)
        t = len(seq)
        pad = self.radius
        padded = np.pad(seq, [(pad, pad)] + [(0, 0)] * (seq.ndim - 1), mode="edge")
        out = np.zeros_like(seq)
        flat = padded.reshape(len(padded), -1)
        center = seq.reshape(t, -1)
        acc = np.zeros_like(center)
        wsum = np.zeros((t, 1))
        for k, off in enumerate(self._offs):
            neigh = flat[pad + off : pad + off + t]
            dist2 = np.mean((neigh - center) ** 2, axis=1, keepdims=True)
            w = self._space_w[k] * np.exp(-dist2 / (2 * self.sigma_value**2))
            acc += w * neigh
            wsum += w
        out = (acc / np.maximum(wsum, 1e-12)).reshape(seq.shape)
        return out.astype(np.float32)
