"""Layer zoo: flax.linen modules with the reference layer semantics.

Covers the reference zoo (/root/reference/saber/nn/layers/*,
speech_anime/layers/*): Conv1d/2d + transposed, pools, FullyConnected, the
reshape layers, weight-norm + act/bn/dropout extensions, LSTM/GRU stacks,
FreqLstm ("spectral gathering"), the attention family ("temporal attention")
and MultiplicativeNoise.

TPU-first notes:
- recurrent layers precompute the input projection for the whole sequence as
  one large matmul (MXU-shaped), the lax.scan carries only the h·Whh step;
- convs go through lax.conv_general_dilated with explicit left-heavy "same"
  padding (reference: saber/nn/functions.py:204-215);
- BatchNorm follows torch semantics (momentum 0.01 → EMA decay 0.99,
  eps 1e-3, biased batch variance) with flax mutable state;
- weight norm stores (v, g) with g initialized to ‖v‖ like
  torch.nn.utils.weight_norm.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import functions as fn

from .precision import CONV_PREC as _CONV_PREC
from .precision import MODEL_PREC as _PREC


def _pair(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


# ---------------------------------------------------------------------------
# extension mixin: pre/post activation + batch norm + dropout
# ---------------------------------------------------------------------------
class _Ext(nn.Module):
    """Shared pre/post module behavior (reference: layers/extend.py:29-106)."""

    bn_axis = -1  # plain class attr (not a dataclass field)
    prev_activation: Optional[str] = None
    prev_batch_norm: Optional[dict] = None
    prev_bn_first: bool = False
    prev_dropout: Optional[float] = None
    prev_drop_always: bool = False
    activation: Optional[str] = None
    batch_norm: Optional[dict] = None
    bn_first: bool = False
    dropout: Optional[float] = None
    drop_always: bool = False

    def setup(self):
        self._prev_act = fn.parse_activation(self.prev_activation)
        self._post_act = fn.parse_activation(self.activation)
        if self.prev_batch_norm is not None:
            self._prev_bn = self._make_bn(self.prev_batch_norm, "prev_bn")
        if self.batch_norm is not None:
            self._post_bn = self._make_bn(self.batch_norm, "post_bn")

    def _make_bn(self, cfg: dict, name: str) -> nn.BatchNorm:
        cfg = dict(cfg or {})
        momentum = float(cfg.get("momentum", 0.1))  # torch default
        eps = float(cfg.get("eps", 1e-5))
        return nn.BatchNorm(
            use_running_average=None,
            momentum=1.0 - momentum,
            epsilon=eps,
            axis=self.bn_axis,
            name=name,
        )

    def _apply_bn(self, bn, x, training: bool):
        return bn(x, use_running_average=not training)

    def has_ext_extras(self) -> bool:
        """True if any pre/post activation, batch-norm, or dropout extra
        is configured — paths that bypass ext_prev/ext_post (fused-kernel
        return_params) must assert this is False."""
        return any(v is not None and v is not False and v != 0 for v in (
            self.prev_activation, self.prev_batch_norm, self.prev_dropout,
            self.activation, self.batch_norm, self.dropout))

    def _drop(self, x, rate, always, training: bool):
        if not rate:
            return x
        if not (training or always):
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)

    def ext_prev(self, x, training: bool):
        if self.prev_bn_first:
            if self.prev_batch_norm is not None:
                x = self._apply_bn(self._prev_bn, x, training)
            x = self._prev_act(x)
        else:
            x = self._prev_act(x)
            if self.prev_batch_norm is not None:
                x = self._apply_bn(self._prev_bn, x, training)
        return self._drop(x, self.prev_dropout, self.prev_drop_always, training)

    def ext_post(self, x, training: bool):
        if self.bn_first:
            if self.batch_norm is not None:
                x = self._apply_bn(self._post_bn, x, training)
            x = self._post_act(x)
        else:
            x = self._post_act(x)
            if self.batch_norm is not None:
                x = self._apply_bn(self._post_bn, x, training)
        return self._drop(x, self.dropout, self.drop_always, training)


def _weight_param(
    module: nn.Module,
    name: str,
    shape: Tuple[int, ...],
    fan_in: int,
    fan_out: int,
    init_method: str,
    init_nonlinearity: Optional[str],
    weight_norm: bool,
    norm_axes: Tuple[int, ...],
):
    """Create kernel (optionally weight-normed (v, g) pair) with torch-style init."""

    def base_init(key, shp, dtype=jnp.float32):
        if init_method == "glorot":
            return fn.glorot_normal_init(key, shp, fan_in, fan_out, dtype)
        if init_method == "default":  # torch default: kaiming uniform a=sqrt(5)
            bound = math.sqrt(1.0 / fan_in)
            return jax.random.uniform(key, shp, dtype, -bound, bound)
        return fn.kaiming_normal_init(key, shp, fan_in, init_nonlinearity, dtype)

    if not weight_norm:
        return module.param(name, base_init, shape)
    v = module.param(name + "_v", base_init, shape)

    def g_init(key, shp, dtype=jnp.float32):
        del key
        return jnp.sqrt(jnp.sum(jnp.square(v), axis=norm_axes)).reshape(shp).astype(dtype)

    g_shape = tuple(shape[a] for a in range(len(shape)) if a not in norm_axes)
    g = module.param(name + "_g", g_init, g_shape)
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=norm_axes, keepdims=True))
    g_full = g.reshape([1 if a in norm_axes else shape[a] for a in range(len(shape))])
    return v / jnp.maximum(norm, 1e-12) * g_full


# ---------------------------------------------------------------------------
# FullyConnected
# ---------------------------------------------------------------------------
class FullyConnected(_Ext):
    in_channels: int = 0
    out_channels: int = 0
    bias: bool = True
    init_method: str = "kaiming"
    init_nonlinearity: Optional[str] = None
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False, return_params: bool = False):
        # return_params: create kernel/bias (identical names — checkpoint-
        # tree unchanged) and hand them to the caller instead of computing;
        # used by fused kernels. Only valid without ext (act/bn) extras,
        # whose parameters would not be created on this path.
        if return_params:
            # loud, not silent: an ext extra on this path would mean
            # missing BN/act params vs the scan path's checkpoint tree
            # and silently-skipped math in the fused consumer
            assert not self.has_ext_extras(), (
                "return_params=True (fused-kernel path) cannot carry "
                f"pre/post act/bn/dropout extras: {self}"
            )
        else:
            shape = x.shape
            x = x.reshape(-1, shape[-1])
            x = self.ext_prev(x, training)
        kernel = _weight_param(
            self, "kernel", (self.in_channels, self.out_channels),
            fan_in=self.in_channels, fan_out=self.out_channels,
            init_method=self.init_method, init_nonlinearity=self.init_nonlinearity,
            weight_norm=self.weight_norm, norm_axes=(0,),
        )
        b = None
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        if return_params:
            return kernel, b
        x = jnp.matmul(x, kernel, precision=_PREC)
        if b is not None:
            x = x + b
        x = self.ext_post(x, training)
        return x.reshape(shape[:-1] + (self.out_channels,))


# ---------------------------------------------------------------------------
# convolutions (layouts follow the reference: NCT / NCHW)
# ---------------------------------------------------------------------------
class Conv1d(_Ext):
    in_channels: int = 0
    out_channels: int = 0
    kernel_size: int = 1
    stride: int = 1
    padding: Union[str, int] = "same"
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    init_method: str = "kaiming"
    init_nonlinearity: Optional[str] = None
    weight_norm: bool = False
    bn_axis = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        # x: (B, C, T)
        x = self.ext_prev(x, training)
        k = int(self.kernel_size)
        if isinstance(self.padding, str):
            lo, hi = fn.get_pad_tuple(x.shape[-1], k, int(self.stride), int(self.dilation), self.padding)
        else:
            lo = hi = int(self.padding)
        fan_in = self.in_channels // self.groups * k
        kernel = _weight_param(
            self, "kernel", (self.out_channels, self.in_channels // self.groups, k),
            fan_in=fan_in, fan_out=self.out_channels * k // self.groups,
            init_method=self.init_method, init_nonlinearity=self.init_nonlinearity,
            weight_norm=self.weight_norm, norm_axes=(1, 2),
        )
        if x.dtype != kernel.dtype:
            # bf16-staged activations (SDFA_LSTM_STAGE_BF16_LAST) meet f32
            # kernels here; lax.conv requires matching dtypes — upcast the
            # input (the only staged->conv consumer is the attention's
            # tiny query window, so this re-materializes almost nothing)
            x = x.astype(kernel.dtype)
        out = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(int(self.stride),),
            padding=[(lo, hi)],
            rhs_dilation=(int(self.dilation),),
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=self.groups,
            precision=_CONV_PREC,
        )
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b[None, :, None]
        return self.ext_post(out, training)


class Conv2d(_Ext):
    in_channels: int = 0
    out_channels: int = 0
    kernel_size: Any = 1
    stride: Any = 1
    padding: Union[str, int] = "same"
    dilation: Any = 1
    groups: int = 1
    bias: bool = True
    init_method: str = "kaiming"
    init_nonlinearity: Optional[str] = None
    weight_norm: bool = False
    bn_axis = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        # x: (B, C, H, W)
        x = self.ext_prev(x, training)
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        dh, dw = _pair(self.dilation)
        if isinstance(self.padding, str):
            pad_w = fn.get_pad_tuple(x.shape[-1], kw, sw, dw, self.padding)
            pad_h = fn.get_pad_tuple(x.shape[-2], kh, sh, dh, self.padding)
        else:
            ph, pw = _pair(self.padding)
            pad_h, pad_w = (ph, ph), (pw, pw)
        fan_in = self.in_channels // self.groups * kh * kw
        kernel = _weight_param(
            self, "kernel", (self.out_channels, self.in_channels // self.groups, kh, kw),
            fan_in=fan_in, fan_out=self.out_channels * kh * kw // self.groups,
            init_method=self.init_method, init_nonlinearity=self.init_nonlinearity,
            weight_norm=self.weight_norm, norm_axes=(1, 2, 3),
        )
        if x.dtype != kernel.dtype:
            x = x.astype(kernel.dtype)  # bf16-staged input, f32 kernel
        out = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(sh, sw),
            padding=[pad_h, pad_w],
            rhs_dilation=(dh, dw),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.groups,
            precision=_CONV_PREC,
        )
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b[None, :, None, None]
        return self.ext_post(out, training)


class ConvTranspose1d(_Ext):
    in_channels: int = 0
    out_channels: int = 0
    kernel_size: int = 1
    stride: int = 1
    padding: Union[str, int] = "same"
    output_padding: int = 0
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    want_size: Optional[Any] = None
    init_method: str = "kaiming"
    init_nonlinearity: Optional[str] = None
    weight_norm: bool = False
    bn_axis = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = self.ext_prev(x, training)
        k, s, d = int(self.kernel_size), int(self.stride), int(self.dilation)
        fan_in = self.in_channels * k // self.groups
        kernel = _weight_param(
            self, "kernel", (self.in_channels, self.out_channels // self.groups, k),
            fan_in=fan_in, fan_out=self.out_channels * k // self.groups,
            init_method=self.init_method, init_nonlinearity=self.init_nonlinearity,
            weight_norm=self.weight_norm, norm_axes=(1, 2),
        )
        # torch ConvTranspose == lhs-dilated conv with flipped kernel
        if x.dtype != kernel.dtype:
            x = x.astype(kernel.dtype)  # bf16-staged input, f32 kernel
        out = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=-1).transpose(1, 0, 2),
            window_strides=(1,),
            padding=[(d * (k - 1), d * (k - 1) + self.output_padding)],
            lhs_dilation=(s,),
            rhs_dilation=(d,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=_CONV_PREC,
        )
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b[None, :, None]
        if self.want_size is not None and isinstance(self.padding, str):
            want = self.want_size[0] if isinstance(self.want_size, (list, tuple)) else self.want_size
            lo, hi = fn.get_pad_tuple(want, k, s, d, self.padding)
            out = out[:, :, lo : out.shape[-1] - hi]
        return self.ext_post(out, training)


class ConvTranspose2d(_Ext):
    in_channels: int = 0
    out_channels: int = 0
    kernel_size: Any = 1
    stride: Any = 1
    padding: Union[str, int] = "same"
    output_padding: int = 0
    dilation: Any = 1
    groups: int = 1
    bias: bool = True
    want_size: Optional[Any] = None
    init_method: str = "kaiming"
    init_nonlinearity: Optional[str] = None
    weight_norm: bool = False
    bn_axis = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = self.ext_prev(x, training)
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        dh, dw = _pair(self.dilation)
        fan_in = self.in_channels * kh * kw // self.groups
        kernel = _weight_param(
            self, "kernel", (self.in_channels, self.out_channels // self.groups, kh, kw),
            fan_in=fan_in, fan_out=self.out_channels * kh * kw // self.groups,
            init_method=self.init_method, init_nonlinearity=self.init_nonlinearity,
            weight_norm=self.weight_norm, norm_axes=(1, 2, 3),
        )
        if x.dtype != kernel.dtype:
            x = x.astype(kernel.dtype)  # bf16-staged input, f32 kernel
        out = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=(-1, -2)).transpose(1, 0, 2, 3),
            window_strides=(1, 1),
            padding=[(dh * (kh - 1), dh * (kh - 1) + self.output_padding),
                     (dw * (kw - 1), dw * (kw - 1) + self.output_padding)],
            lhs_dilation=(sh, sw),
            rhs_dilation=(dh, dw),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=_CONV_PREC,
        )
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b[None, :, None, None]
        if self.want_size is not None and isinstance(self.padding, str):
            wh, ww = self.want_size
            lo_h, hi_h = fn.get_pad_tuple(wh, kh, sh, dh, self.padding)
            lo_w, hi_w = fn.get_pad_tuple(ww, kw, sw, dw, self.padding)
            out = out[:, :, lo_h : out.shape[-2] - hi_h, lo_w : out.shape[-1] - hi_w]
        return self.ext_post(out, training)


class Pool1d(nn.Module):
    mode: str = "max"
    kernel_size: int = 2
    stride: Optional[int] = None
    padding: Union[str, int] = "same"

    @nn.compact
    def __call__(self, x, training: bool = False):
        k = int(self.kernel_size)
        s = int(self.stride or k)
        if isinstance(self.padding, str):
            lo, hi = fn.get_pad_tuple(x.shape[-1], k, s, 1, self.padding)
        else:
            lo = hi = int(self.padding)
        x = _pad_or_crop(x, [(0, 0), (0, 0), (lo, hi)])  # reference zero-pads
        if self.mode == "max":
            return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                         (1, 1, k), (1, 1, s), "VALID")
        summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, k), (1, 1, s), "VALID")
        return summed / k


def _pad_or_crop(x, pads):
    """Zero-pad (positive) or crop (negative) per axis — torch F.pad
    semantics, which the reference's same-pad relies on when stride > 1
    leaves padlr negative (functions.py:204-209)."""
    if any(p < 0 for pair in pads for p in pair):
        slices = tuple(
            slice(max(-lo, 0), x.shape[i] - max(-hi, 0))
            for i, (lo, hi) in enumerate(pads)
        )
        x = x[slices]
        pads = [(max(lo, 0), max(hi, 0)) for lo, hi in pads]
    return jnp.pad(x, pads, constant_values=0.0)


class Pool2d(nn.Module):
    mode: str = "max"
    kernel_size: Any = 2
    stride: Optional[Any] = None
    padding: Union[str, int] = "same"

    @nn.compact
    def __call__(self, x, training: bool = False):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride or self.kernel_size)
        if isinstance(self.padding, str):
            ph = fn.get_pad_tuple(x.shape[-2], kh, sh, 1, self.padding)
            pw = fn.get_pad_tuple(x.shape[-1], kw, sw, 1, self.padding)
        else:
            p0, p1 = _pair(self.padding)
            ph, pw = (p0, p0), (p1, p1)
        x = _pad_or_crop(x, [(0, 0), (0, 0), ph, pw])
        if self.mode == "max":
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, kh, kw), (1, 1, sh, sw), "VALID"
            )
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, kh, kw), (1, 1, sh, sw), "VALID"
        )
        return summed / (kh * kw)


# ---------------------------------------------------------------------------
# reshape layers (reference: saber/nn/layers/reshape.py)
# ---------------------------------------------------------------------------
class Flatten(nn.Module):
    start_dim: int = 1

    def __call__(self, x, training: bool = False):
        return x.reshape(x.shape[: self.start_dim] + (-1,))


class Permute(nn.Module):
    dims: Sequence[int] = ()

    def __call__(self, x, training: bool = False):
        return jnp.transpose(x, self.dims)


class Transpose(nn.Module):
    dim0: int = 0
    dim1: int = 1

    def __call__(self, x, training: bool = False):
        return jnp.swapaxes(x, self.dim0, self.dim1)


class Squeeze(nn.Module):
    dim: int = 0

    def __call__(self, x, training: bool = False):
        return jnp.squeeze(x, axis=self.dim)


class Unsqueeze(nn.Module):
    dim: int = 0

    def __call__(self, x, training: bool = False):
        return jnp.expand_dims(x, axis=self.dim)


class View(nn.Module):
    shape: Sequence[int] = ()

    def __call__(self, x, training: bool = False):
        return x.reshape(tuple(self.shape))


class Identity(nn.Module):
    def __call__(self, x, training: bool = False):
        return x


class GradScaler(nn.Module):
    """Scales gradients in backward, identity forward
    (reference: saber/nn/functions.py:397-420)."""

    scale: float = 1.0

    def __call__(self, x, training: bool = False):
        s = self.scale
        return x * s + jax.lax.stop_gradient(x * (1.0 - s))


class Residual1d(nn.Module):
    """Pre-activation residual conv block (reference conv1d.py:103-150)."""

    in_channels: int = 0
    out_channels: int = 0
    stride: int = 1
    batch_norm: Optional[dict] = None
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        residual = x
        h = jax.nn.relu(x)
        h = Conv1d(in_channels=self.in_channels, out_channels=self.out_channels,
                   kernel_size=3, stride=self.stride, bias=False,
                   batch_norm=self.batch_norm, bn_first=True, activation="relu",
                   weight_norm=self.weight_norm, name="conv1")(h, training)
        h = Conv1d(in_channels=self.out_channels, out_channels=self.out_channels,
                   kernel_size=3, bias=False, batch_norm=self.batch_norm,
                   weight_norm=self.weight_norm, name="conv2")(h, training)
        if self.in_channels != self.out_channels:
            residual = Conv1d(in_channels=self.in_channels,
                              out_channels=self.out_channels, kernel_size=1,
                              bias=False, weight_norm=self.weight_norm,
                              name="shortcut")(residual, training)
        return h + residual


class ResidualStack1d(nn.Module):
    """(reference conv1d.py:153-176)."""

    in_channels: int = 0
    out_channels: int = 0
    num_blocks: int = 1
    batch_norm: Optional[dict] = None
    weight_norm: bool = False
    last_activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, training: bool = False):
        cin = self.in_channels
        for i in range(self.num_blocks):
            x = Residual1d(in_channels=cin, out_channels=self.out_channels,
                           batch_norm=self.batch_norm, weight_norm=self.weight_norm,
                           name=f"block_{i}")(x, training)
            cin = self.out_channels
        return fn.parse_activation(self.last_activation)(x)


class MultiplicativeNoise(nn.Module):
    """x · base^N(mean, std), same noise for adjacent-frame half batch
    (reference: speech_anime/layers/misc.py:29-43)."""

    base: float = 1.4
    mean: float = 0.0
    std: float = 1.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        if not training:
            return x
        rng = self.make_rng("dropout")
        size = (x.shape[0], x.shape[1]) + (1,) * (x.ndim - 2)
        noise = self.mean + self.std * jax.random.normal(rng, size)
        if x.shape[0] > 1:
            half = x.shape[0] // 2
            noise = noise.at[half:].set(noise[:half])
        return x * jnp.power(self.base, noise)
