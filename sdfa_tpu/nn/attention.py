"""Attention family — "temporal attention".

Reference: /root/reference/speech_anime/layers/attentions.py:7-236.
Base behavior: the query is a length-(2r−1) center window of the sequence,
compressed to one step by a stride-(2r−1) Conv1d; ``context = align · value``.
Shipped configs use BahdanauAttention with eval-time score scaling
(config/model/dgrad.py:69).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv1d, FullyConnected

from .precision import MODEL_PREC as _PREC


def _smoothing_normalization(e, axis=-1):
    s = jax.nn.sigmoid(e)
    return s / jnp.sum(s, axis=axis, keepdims=True)


class _Attention(nn.Module):
    num_units: int = 128
    query_size: int = 512
    key_size: int = 512
    query_radius: int = 1

    @property
    def qry_length(self) -> int:
        return self.query_radius * 2 - 1

    def _compress_query(self, query):
        """(N, 2r−1, C) → (N, 1, C) via stride-(2r−1) conv (attentions.py:49-54)."""
        conv = Conv1d(
            in_channels=self.query_size,
            out_channels=self.query_size,
            kernel_size=self.qry_length,
            stride=self.qry_length,
            padding="valid",
            bias=False,
            name="conv_query",
        )
        q = jnp.swapaxes(query, 1, 2)  # (N, C, T)
        q = conv(q)
        return jnp.swapaxes(q, 1, 2)  # (N, 1, C)

    @nn.compact
    def __call__(self, query, key, value=None, training: bool = False):
        if value is None:
            value = key
        assert query.shape[1] == self.qry_length and query.shape[2] == self.query_size
        query = self._compress_query(query)
        align = self.get_alignment(query, key, training)
        context = jnp.matmul(align, value, precision=_PREC)
        return context, align

    def get_alignment(self, query, key, training):  # pragma: no cover
        raise NotImplementedError


class BahdanauAttention(_Attention):
    """Additive attention with eval-time score scaling and optional smooth
    sigmoid normalization (attentions.py:92-124)."""

    smooth: bool = False
    scale_score_at_eval: float = 1.0

    def get_alignment(self, query, key, training):
        proj_qry = FullyConnected(in_channels=self.query_size, out_channels=self.num_units,
                                  bias=False, init_method="glorot", name="proj_qry")
        proj_key = FullyConnected(in_channels=self.key_size, out_channels=self.num_units,
                                  bias=False, init_method="glorot", name="proj_key")
        v = FullyConnected(in_channels=self.num_units, out_channels=1,
                           bias=False, init_method="glorot", name="v")
        b = self.param("b", nn.initializers.zeros, (1, 1, self.num_units))

        q = proj_qry(query)  # (N, 1, U)
        k = proj_key(key)  # (N, T, U)
        score = v(jnp.tanh(q + k + b))  # (N, T, 1)
        score = jnp.swapaxes(score, 1, 2)  # (N, 1, T)
        if not training:
            score = score * self.scale_score_at_eval
        if self.smooth:
            return _smoothing_normalization(score, axis=-1)
        return jax.nn.softmax(score, axis=-1)


class ProdAttention(_Attention):
    """Scaled dot-product attention (attentions.py:176-212)."""

    num_proj_layers: int = 1

    def get_alignment(self, query, key, training):
        q, k = query, key
        for i in range(self.num_proj_layers):
            act = "lrelu@a:0.2" if i < self.num_proj_layers - 1 else "linear"
            qin = self.query_size if i == 0 else self.num_units
            kin = self.key_size if i == 0 else self.num_units
            q = FullyConnected(in_channels=qin, out_channels=self.num_units, bias=False,
                               activation=act, init_method="glorot", name=f"proj_qry_{i}")(q)
            k = FullyConnected(in_channels=kin, out_channels=self.num_units, bias=False,
                               activation=act, init_method="glorot", name=f"proj_key_{i}")(k)
        score = jnp.matmul(q, jnp.swapaxes(k, 1, 2), precision=_PREC)
        score = score / math.sqrt(self.num_units)
        return jax.nn.softmax(score, axis=-1)


class GmmAttention(_Attention):
    """Graves GMM attention (attentions.py:127-173)."""

    num_k: int = 4
    softmax: bool = False
    scale_x: float = 6.0

    def get_alignment(self, query, key, training):
        x = query[:, 0, :]
        x = FullyConnected(in_channels=self.query_size, out_channels=self.num_units, bias=False,
                           activation="lrelu@a:0.01", name="proj_0")(x)
        x = FullyConnected(in_channels=self.num_units, out_channels=self.num_units, bias=False,
                           activation="lrelu@a:0.01", name="proj_1")(x)
        x = FullyConnected(in_channels=self.num_units, out_channels=self.num_k * 3, bias=False,
                           name="proj_2")(x)
        alpha_hat, beta_hat, kappa_hat = jnp.split(x, 3, axis=1)
        if self.softmax:
            alpha = jax.nn.softmax(alpha_hat, axis=1)
        else:
            alpha = jnp.exp(alpha_hat) / float(self.num_k)
        beta = jnp.exp(beta_hat)
        kappa = kappa_hat
        length = key.shape[1]
        pos = (jnp.arange(length, dtype=jnp.float32) / float(length) - 0.5) * self.scale_x
        pos = pos[None, None, :]  # (1, 1, T)
        align = jnp.sum(
            alpha[..., None] * jnp.exp(-beta[..., None] * (pos - kappa[..., None]) ** 2),
            axis=1,
            keepdims=True,
        )
        return align


def create_self_atten(
    name: str,
    memory_size: int,
    num_units: int,
    query_radius: int,
    smooth: bool = False,
    scale_score_at_eval: float = 1.0,
    num_k: Optional[int] = None,
    softmax: bool = False,
    scale_x: float = 6.0,
    num_heads: Optional[int] = None,
    **kwargs,
):
    """Factory matching the reference spec ("attn", name, memory, units, radius, ...)."""
    common = dict(
        num_units=num_units,
        query_size=memory_size,
        key_size=memory_size,
        query_radius=query_radius,
    )
    if name == "bah":
        return BahdanauAttention(smooth=smooth, scale_score_at_eval=scale_score_at_eval, **common)
    if name == "gmm":
        assert num_k is not None
        return GmmAttention(num_k=num_k, softmax=softmax, scale_x=scale_x, **common)
    if name == "prod":
        return ProdAttention(**common)
    raise NotImplementedError(f"attention '{name}' is not supported")
