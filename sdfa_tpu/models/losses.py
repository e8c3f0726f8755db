"""Training losses — functional, with explicit scaler state.

Reference: /root/reference/speech_anime/model/criterion.py.
- PLoss: MSE on values; for dgrad face_data the 3-wide rotation branch is
  exp()'d first; dgrad losses sum over the last dim (scale/rotat have
  different widths) then mean; per-sample anime weights; mean over batch.
- MLoss ("motion"): MSE between adjacent-frame deltas, exploiting the
  doubled batch (first half = frame i, second half = frame i+1).
- ELoss: embedding consistency between adjacent frames.
- DynamicLossScaler: RMS-EMA normalization (beta .99); torch kept it as
  Python object state — here it is an explicit (vt, beta_t) carry so it
  lives inside the jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ScalerState(NamedTuple):
    vt: jnp.ndarray      # scalar EMA of loss²
    beta_t: jnp.ndarray  # scalar running beta^t

    @classmethod
    def init(cls) -> "ScalerState":
        return cls(vt=jnp.zeros(()), beta_t=jnp.ones(()))


def dynamic_scale(
    loss: jnp.ndarray,
    state: ScalerState,
    training: bool,
    beta: float = 0.99,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, ScalerState]:
    """criterion.py:90-112: divide loss by the bias-corrected RMS EMA."""
    if training:
        loss_ms = jax.lax.stop_gradient(jnp.mean(loss**2))
        beta_t = state.beta_t * beta
        vt = beta * state.vt + (1.0 - beta) * loss_ms
        scale = jnp.sqrt(vt / (1.0 - beta_t)) + eps
        new_state = ScalerState(vt=vt, beta_t=beta_t)
    else:
        scale = jnp.sqrt(state.vt / jnp.maximum(1.0 - state.beta_t, 1e-12)) + eps
        scale = jnp.where(state.beta_t >= 1.0, 1.0, scale)  # never updated yet
        new_state = state
    return jnp.mean(loss) / scale, new_state


def _maybe_exp(pred, true, is_dgrad_face_data: bool):
    if is_dgrad_face_data and pred.shape[-1] == 3:
        return jnp.exp(pred), jnp.exp(true)
    return pred, true


def _reduce(loss: jnp.ndarray, is_dgrad: bool) -> jnp.ndarray:
    """dgrad: sum last dim (scale/rotat widths differ), then mean the rest
    down to a per-sample vector (criterion.py:28-36)."""
    if is_dgrad:
        loss = loss.sum(-1)
    while loss.ndim > 1:
        loss = loss.mean(-1)
    return loss


def ploss(pred, true, weights, *, is_dgrad: bool, is_face_data: bool) -> jnp.ndarray:
    """Returns per-batch scalar (already weighted + batch-meaned)."""
    p, t = _maybe_exp(pred, true, is_dgrad and is_face_data)
    loss = (p - t) ** 2
    loss = _reduce(loss, is_dgrad)
    return jnp.mean(loss * weights)


def mloss(pred, true, weights, *, is_dgrad: bool, is_face_data: bool) -> jnp.ndarray:
    bhs = pred.shape[0] // 2
    p, t = _maybe_exp(pred, true, is_dgrad and is_face_data)
    m_pred = p[bhs:] - p[:bhs]
    m_true = t[bhs:] - t[:bhs]
    loss = (m_pred - m_true) ** 2
    loss = _reduce(loss, is_dgrad)
    half_weights = weights[bhs:] + weights[:bhs]
    return jnp.mean(loss * half_weights)


def ploss_flat(pred_flat, true_flat, weights, *, group: int,
               exp_values: bool = False) -> jnp.ndarray:
    """Layout-safe dgrad PLoss on flat (N, L, tris·k) tensors.

    Identity used: sum over the k-wide last dim then mean over tris
    == sum over the flat dim ÷ n_tris — avoids materializing the
    (…, tris, k) layout (128-lane padding) in forward AND backward.
    """
    p, t = (jnp.exp(pred_flat), jnp.exp(true_flat)) if exp_values else (pred_flat, true_flat)
    n_tris = pred_flat.shape[-1] // group
    per = jnp.sum((p - t) ** 2, axis=-1) / n_tris  # (N, L)
    while per.ndim > 1:
        per = per.mean(-1)
    return jnp.mean(per * weights)


def mloss_flat(pred_flat, true_flat, weights, *, group: int,
               exp_values: bool = False) -> jnp.ndarray:
    bhs = pred_flat.shape[0] // 2
    p, t = (jnp.exp(pred_flat), jnp.exp(true_flat)) if exp_values else (pred_flat, true_flat)
    n_tris = pred_flat.shape[-1] // group
    mp = p[bhs:] - p[:bhs]
    mt = t[bhs:] - t[:bhs]
    per = jnp.sum((mp - mt) ** 2, axis=-1) / n_tris
    while per.ndim > 1:
        per = per.mean(-1)
    half_weights = weights[bhs:] + weights[:bhs]
    return jnp.mean(per * half_weights)


def eloss(evector: jnp.ndarray) -> jnp.ndarray:
    """Embedding-consistency loss (criterion.py:76-87)."""
    bhs = evector.shape[0] // 2
    diff = (evector[bhs:] - evector[:bhs]) ** 2
    magn = evector**2
    return jnp.mean(diff.sum(axis=1) * 2.0 / jnp.mean(magn))
