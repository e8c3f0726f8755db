"""Learning-rate schedules (reference: saber/trainer/lr_schedulers.py).

Each builder returns ``(lr_fn, beta1_fn)`` of the iteration counter — pure
functions usable inside the jitted train step via optax.inject_hyperparams.
``mode`` ("step" | "epoch") decides which counter the caller feeds in.
NoamZero additionally ramps Adam beta1 toward 0.5 during the final decay
(lr_schedulers.py:130-177).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp


def constant(base_lr: float, **_):
    return (lambda it: jnp.asarray(base_lr, jnp.float32)), None


def exp_decay(base_lr: float, gamma: float, start_iter: int = 50000,
              gap_iters: int = 1, min_scale: float = 0.001, **_):
    def fn(it):
        expon = jnp.floor_divide(it - start_iter, gap_iters)
        scale = jnp.power(gamma, jnp.maximum(expon.astype(jnp.float32), 0.0))
        return base_lr * jnp.maximum(scale, min_scale)

    return fn, None


def noam_decay(base_lr: float, warmup_iters: int, **_):
    def fn(it):
        warm = float(warmup_iters)
        cur = jnp.maximum(it, 0).astype(jnp.float32) + 1.0
        scale = (warm**0.5) * jnp.minimum(cur * (warm**-1.5), cur**-0.5)
        return base_lr * scale

    return fn, None


def noam_zero(base_lr: float, warmup_iters: int, start_ramp: int, total_iters: int,
              base_beta1: float = 0.9, **_):
    assert warmup_iters < start_ramp < total_iters

    def ramp_of(it):
        cur = jnp.maximum(it, 0).astype(jnp.float32) + 1.0
        ramp = (total_iters - cur) / float(total_iters - start_ramp)
        return jnp.clip(ramp, 0.0, 1.0), cur

    def fn(it):
        ramp, cur = ramp_of(it)
        warm = float(warmup_iters)
        scale = (warm**0.5) * jnp.minimum(cur * (warm**-1.5), cur**-0.5)
        scale = jnp.where(cur < start_ramp, scale, scale * ramp)
        return base_lr * scale

    def beta1_fn(it):
        ramp, cur = ramp_of(it)
        b1 = base_beta1 * ramp + 0.5 * (1.0 - ramp)
        return jnp.where(cur < start_ramp, base_beta1, b1)

    return fn, beta1_fn


_REGISTRY = {
    "Constant": constant,
    "ExpDecay": exp_decay,
    "NoamDecay": noam_decay,
    "NoamZero": noam_zero,
}


def build(name: Optional[str], base_lr: float, args: Optional[dict] = None):
    """Returns (lr_fn, beta1_fn, mode)."""
    args = dict(args or {})
    mode = args.pop("mode", "epoch")
    if name is None:
        fn, b1 = constant(base_lr)
    else:
        assert name in _REGISTRY, f"unknown lr scheduler: {name}"
        fn, b1 = _REGISTRY[name](base_lr, **args)
    return fn, b1, mode
