"""NN functional helpers: activation parsing, conv padding math, init, masks.

Reference surfaces (/root/reference/saber/nn/functions.py):
- activation parser incl. ``lrelu@a:0.2`` / ``glu@dim:`` syntax (:102-187)
- TF-style left-heavy ``same``/``valid``/``causal`` conv padding (:193-291)
- kaiming/glorot init with torch gain semantics (:123-155)
- one_hot (:375-378)
"""

from __future__ import annotations

import math
import re
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------
def _analyze_activation(name: Optional[str]) -> Tuple[Optional[str], float]:
    """``"lrelu@a:0.2"`` → ("leaky_relu", 0.2); plain names → (name, 0.0)."""
    if name is None or name == "linear":
        return None, 0.0
    if "@" in name:
        base, _, arg = name.partition("@")
        key, _, val = arg.partition(":")
        base = {"lrelu": "leaky_relu"}.get(base, base)
        return base, float(val)
    return {"lrelu": "leaky_relu"}.get(name, name), 0.0


def parse_activation(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    base, arg = _analyze_activation(name)
    if base is None:
        return lambda x: x
    if base == "relu":
        return jax.nn.relu
    if base == "sigmoid":
        return jax.nn.sigmoid
    if base == "softmax":
        return lambda x: jax.nn.softmax(x, axis=-1)
    if base == "tanh":
        return jnp.tanh
    if base == "softplus":
        return jax.nn.softplus
    if base == "leaky_relu":
        a = arg if arg else 0.01
        return lambda x: jax.nn.leaky_relu(x, negative_slope=a)
    if base == "glu":
        dim = int(arg)
        return lambda x: _glu(x, dim)
    raise ValueError(f"unsupported activation: {name}")


def _glu(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def activation_gain(name: Optional[str]) -> float:
    """torch.nn.init.calculate_gain equivalent for our activation names."""
    base, arg = _analyze_activation(name)
    if base in (None, "sigmoid", "glu"):
        return 1.0
    if base == "tanh":
        return 5.0 / 3.0
    if base == "relu":
        return math.sqrt(2.0)
    if base == "leaky_relu":
        a = arg if arg else 0.01
        return math.sqrt(2.0 / (1.0 + a * a))
    return 1.0


# ---------------------------------------------------------------------------
# padding math (TF-style, left-heavy same)
# ---------------------------------------------------------------------------
def get_pad_tuple(size: int, kernel_size: int, stride: int, dilation: int, padding: str):
    """Reference functions.py:204-215; note left = padlr − padlr//2 (left-heavy).

    padlr can go NEGATIVE when stride > 1 and size is not a stride multiple
    — the reference passes the negative values to F.pad, which CROPS. The
    conv layers forward negatives to conv_general_dilated (XLA supports
    negative window padding); the pool layers crop explicitly
    (tests/test_reference_oracle_parity.py pins this against saber itself)."""
    padlr = (size // stride - 1) * stride + dilation * (kernel_size - 1) + 1 - size
    if padding == "same":
        right = padlr // 2
        left = padlr - right
        return (left, right)
    if padding == "causal":
        return (padlr, 0)
    if padding == "valid":
        return (0, 0)
    raise ValueError(f"unknown padding mode: {padding}")


def size_after_conv(length: int, kernel_size: int, stride: int, dilation: int = 1,
                    padding: str = "same") -> int:
    lo, hi = get_pad_tuple(length, kernel_size, stride, dilation, padding)
    length = length + lo + hi - dilation * (kernel_size - 1) - 1
    return length // stride + 1


# ---------------------------------------------------------------------------
# init (matching torch semantics so behavior parity holds)
# ---------------------------------------------------------------------------
def kaiming_normal_init(key, shape, fan_in: int, nonlinearity: Optional[str], dtype=jnp.float32):
    gain = activation_gain(nonlinearity or "leaky_relu@a:0")
    std = gain / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape, dtype)


def glorot_normal_init(key, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------
def one_hot(ids: jnp.ndarray, n: int, dtype=jnp.float32) -> jnp.ndarray:
    return jax.nn.one_hot(ids, n, dtype=dtype)


def generate_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """1 where position < length."""
    pos = jnp.arange(max_length)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)
