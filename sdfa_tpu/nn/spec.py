"""Layer-spec DSL: tuple specs → flax modules + the sequential forward engine.

Reproduces the reference model-definition language so shipped configs load
as-is (/root/reference/saber/nn/layers/easy_create.py:13-211 and
speech_anime/layers/__init__.py:23-148):

    ("conv2d", 3, 32, (3, 1), (1, 1), "act=lrelu@a:0.2", "batch_norm={...}")
    ("freq-lstm", 64, 32, "hidden_size=128", "output_size=256")
    ("attn", "bah", 512, 128, 2, "scale_score_at_eval=1.0")

Engine behavior (speech_anime/layers/__init__.py:69-147): ``cat_condition``
broadcast-concat of the speaker condition, attention query = center window
of the time axis (with ``query_offset``), alignment capture, and
``skip_connect`` residuals.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..utils import log
from ..utils.argparser import parse_named_arg
from . import attention, layers, recurrent

# abbreviations (easy_create.py:14-24)
_BREVS = {
    "act": "activation",
    "ksz": "kernel_size",
    "hop": "stride",
    "pad": "padding",
    "dil": "dilation",
    "in": "in_channels",
    "out": "out_channels",
    "init": "init_method",
    "nonlinear": "init_nonlinearity",
}

# engine-level keys that never reach a constructor
_ENGINE_KEYS = ("residual", "condition", "cat_condition", "skip_connect", "query_offset")

# name → (constructor, positional arg names, accepts weight_norm)
_REGISTRY: Dict[str, Tuple[Any, List[str], bool]] = {
    "fc": (layers.FullyConnected, ["in_channels", "out_channels", "bias"], True),
    "fp": (layers.Conv1d, ["in_channels", "out_channels", "bias"], True),
    "conv1d": (layers.Conv1d,
               ["in_channels", "out_channels", "kernel_size", "stride", "padding",
                "dilation", "groups", "bias"], True),
    "conv2d": (layers.Conv2d,
               ["in_channels", "out_channels", "kernel_size", "stride", "padding",
                "dilation", "groups", "bias"], True),
    "deconv2d": (layers.ConvTranspose2d,
                 ["in_channels", "out_channels", "kernel_size", "stride", "padding",
                  "output_padding", "dilation", "groups", "bias", "want_size"], True),
    "deconv1d": (layers.ConvTranspose1d,
                 ["in_channels", "out_channels", "kernel_size", "stride", "padding",
                  "output_padding", "dilation", "groups", "bias", "want_size"], True),
    "pool1d": (layers.Pool1d, ["mode", "kernel_size", "stride", "padding"], False),
    "res1d": (layers.ResidualStack1d,
              ["in_channels", "out_channels", "num_blocks"], True),
    "pool2d": (layers.Pool2d, ["mode", "kernel_size", "stride", "padding"], False),
    "flatten": (layers.Flatten, ["start_dim"], False),
    "permute": (layers.Permute, ["dims"], False),
    "transpose": (layers.Transpose, ["dim0", "dim1"], False),
    "squeeze": (layers.Squeeze, ["dim"], False),
    "unsqueeze": (layers.Unsqueeze, ["dim"], False),
    "view": (layers.View, ["shape"], False),
    "identity": (layers.Identity, [], False),
    "gradx": (layers.GradScaler, ["scale"], False),
    "lstm": (recurrent.LSTM,
             ["input_size", "hidden_size", "num_layers", "bias", "batch_first",
              "dropout", "bidirectional"], False),
    "gru": (recurrent.GRU,
            ["input_size", "hidden_size", "num_layers", "bias", "batch_first",
             "dropout", "bidirectional"], False),
    "freq-lstm": (recurrent.FreqLstm,
                  ["input_size", "freq_length", "hidden_size", "output_size",
                   "bias", "mode"], False),
    "lstm2d": (recurrent.LSTM2d,
               ["input_size", "hidden_size", "num_layers", "bias"], False),
    "attn": (attention.create_self_atten,
             ["name", "memory_size", "num_units", "query_radius"], False),
    "mul-noise": (layers.MultiplicativeNoise, ["base", "mean", "std"], False),
}


def _freeze(v):
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    return v


def _thaw(v):
    """Inverse of _freeze for dict-like frozen values used as kwargs."""
    if isinstance(v, tuple) and v and all(
        isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], str) for x in v
    ):
        return {k: _thaw(x) for k, x in v}
    return v


class LayerParser:
    """Parses one layer-info tuple into constructor kwargs + engine extras."""

    def __init__(self, layer_info: Sequence[Any]):
        layer_info = list(layer_info)
        assert len(layer_info) > 0
        self.name = layer_info[0]
        assert self.name in _REGISTRY, f"layer '{self.name}' is not supported"
        ctor, pos_names, takes_wn = _REGISTRY[self.name]
        self.ctor = ctor
        self.takes_weight_norm = takes_wn
        kwargs: Dict[str, Any] = {}
        extras: Dict[str, Any] = {}
        pos = 0
        for item in layer_info[1:]:
            if isinstance(item, str) and "=" in item:
                key, val = parse_named_arg(item)
                key = _BREVS.get(key, key)
                if key in _ENGINE_KEYS:
                    extras[key] = val
                elif key == "weight_norm":
                    if takes_wn:
                        kwargs[key] = val
                else:
                    kwargs[key] = val
            else:
                assert pos < len(pos_names), (
                    f"too many positional args for '{self.name}': {layer_info}"
                )
                kwargs[pos_names[pos]] = item
                pos += 1
        self.kwargs = kwargs
        self.extras = extras

    @property
    def is_attention(self) -> bool:
        return self.name == "attn"

    @property
    def is_rnn(self) -> bool:
        return self.name in ("lstm", "gru")

    def get(self, key, default=None):
        if key in self.extras:
            return self.extras[key]
        return self.kwargs.get(key, default)

    def build(self, name: str) -> nn.Module:
        kwargs = dict(self.kwargs)
        # tuples for shape-like args are fine; dicts (batch_norm) stay dicts
        if self.name == "attn":
            return self.ctor(**kwargs).clone(name=name) if hasattr(
                self.ctor(**kwargs), "clone") else self.ctor(**kwargs)
        return self.ctor(name=name, **kwargs)


def parse_specs(layer_info_list, weight_norm: bool = False) -> List[LayerParser]:
    """Parse a config layer list; ``weight_norm`` is the model-global flag the
    reference appends to every spec (speech_anime/layers/__init__.py:37-60)."""
    parsers = []
    for info in layer_info_list:
        info = list(info)
        info.append(f"weight_norm={bool(weight_norm)}")
        parsers.append(LayerParser(info))
    return parsers


class LayerStack(nn.Module):
    """Sequential engine over a parsed spec list.

    Call: ``(x, condition, training) → (out, align_dict)``.
    """

    specs: Tuple[Any, ...] = ()  # frozen layer_info tuples
    weight_norm: bool = False
    tag: str = "stack"
    verbose: bool = False

    def setup(self):
        raw = [list(_thaw_spec(s)) for s in self.specs]
        self.parsers = parse_specs(raw, self.weight_norm)
        built = []
        for i, parser in enumerate(self.parsers):
            if parser.is_attention:
                kwargs = dict(parser.kwargs)
                built.append(attention.create_self_atten(**kwargs))
            else:
                kwargs = dict(parser.kwargs)
                built.append(parser.ctor(**kwargs))
        self.built_layers = built

    def __call__(self, x, condition=None, training: bool = False, align_dict=None,
                 start: int = 0, stop: Optional[int] = None):
        """Run layers [start:stop). Subranges power the window-overlap fast
        path: the time-independent prefix runs once per clip, the temporal
        suffix per window (DESIGN.md §10). skip_connect history indices stay
        absolute (history[i] = input of layer i); a skip that reaches before
        ``start`` is rejected by ``encoder_overlap_split`` (which returns
        split=0, disabling the overlap path, when a suffix layer's
        skip_connect points into the prefix)."""
        history = [None] * start
        aligns = {}
        layers_and_parsers = list(zip(self.built_layers, self.parsers))
        for i, (module, parser) in enumerate(
            layers_and_parsers[start:stop], start=start
        ):
            history.append(x)
            inputs = x
            cat_dim = parser.extras.get("cat_condition")
            if condition is not None and cat_dim is not None:
                if cat_dim < 0:
                    cat_dim += inputs.ndim
                assert cat_dim > 0 and condition.ndim == 2
                cond = condition
                shape = list(inputs.shape)
                shape[cat_dim] = cond.shape[1]
                for axis in range(1, inputs.ndim):
                    if axis != cat_dim:
                        cond = jnp.expand_dims(cond, axis)
                cond = jnp.broadcast_to(cond, shape)
                inputs = jnp.concatenate([inputs, cond], axis=cat_dim)
            if parser.is_attention:
                radius = parser.kwargs.get("query_radius", parser.kwargs.get("radius", 1))
                ahead, after = radius - 1, radius
                mid = inputs.shape[1] // 2 + parser.extras.get("query_offset", 0)
                query = inputs[:, mid - ahead : mid + after, :]
                out, align = module(query, inputs, training=training)
                aligns[f"{self.tag}{i:02d}"] = align
            else:
                out = module(inputs, training=training)
            skip = parser.extras.get("skip_connect")
            if isinstance(skip, int):
                out = out + history[skip]
            x = out
        if isinstance(align_dict, dict):
            align_dict.update(aligns)
        return x, aligns


def _as_pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def time_independent_prefix(parsers: Sequence[LayerParser]) -> Tuple[int, int]:
    """(prefix_len, time_axis) — the leading layer run that is provably
    independent across the time axis (each timestep computable from that
    timestep alone, in eval mode), and where the time axis sits in the
    prefix output.

    Powers the window-overlap inference fast path: with 98.6% overlap
    between adjacent sliding windows (SURVEY.md §7 "Hard parts" #5), the
    per-frame prefix runs ONCE on the clip-level frame grid and windows
    gather from its output; only the suffix (LSTM/attention — true temporal
    coupling) runs per window.

    Tracks the time-axis position through the stack, starting from the
    model input layout (N, T, F, C). Conservative: any layer it cannot
    prove per-timestep ends the prefix. Layers with ``cat_condition`` end
    it too (the condition is per-window, the prefix is window-agnostic);
    ``skip_connect`` is allowed only within the prefix."""
    taxis = 1  # (N, T, F, C)
    ndim = 4
    for i, p in enumerate(parsers):
        if "cat_condition" in p.extras:
            return i, taxis
        skip = p.extras.get("skip_connect")
        if isinstance(skip, int) and not (0 <= skip < i):
            return i, taxis
        name = p.name
        if name == "permute":
            dims = p.kwargs.get("dims")
            if dims is None or len(dims) != ndim:
                return i, taxis
            taxis = list(dims).index(taxis)
        elif name in ("conv2d", "pool2d"):
            # layout (N, C, H, W): spatial axes 2, 3
            if ndim != 4 or taxis in (0, 1):
                return i, taxis  # conv over channels mixes time when taxis==1
            k = _as_pair(p.kwargs.get("kernel_size", 1))
            s = _as_pair(p.kwargs.get("stride", k if name == "pool2d" else 1))
            d = _as_pair(p.kwargs.get("dilation", 1))
            j = taxis - 2
            if k[j] != 1 or s[j] != 1 or (name == "conv2d" and d[j] != 1):
                return i, taxis
        elif name in ("conv1d", "fp"):
            # layout (N, C, T'): spatial axis 2
            if ndim != 3 or taxis != 2:
                return i, taxis
            if (p.kwargs.get("kernel_size", 1) != 1
                    or p.kwargs.get("stride", 1) != 1):
                return i, taxis
        elif name == "freq-lstm":
            # recurrent along F of (N, C, F, T): per-timestep iff time is
            # the trailing axis; output (N, out, 1, T)
            if ndim != 4 or taxis != 3:
                return i, taxis
        elif name == "fc":
            if taxis == ndim - 1:
                return i, taxis
        elif name == "squeeze":
            dim = p.kwargs.get("dim")
            if dim is None:
                return i, taxis
            if dim < 0:
                dim += ndim
            if dim == taxis:
                return i, taxis
            if dim < taxis:
                taxis -= 1
            ndim -= 1
        elif name == "unsqueeze":
            dim = p.kwargs.get("dim")
            if dim is None:
                return i, taxis
            if dim < 0:
                dim += ndim + 1
            if dim <= taxis:
                taxis += 1
            ndim += 1
        elif name == "transpose":
            d0, d1 = p.kwargs.get("dim0"), p.kwargs.get("dim1")
            if d0 is None or d1 is None:
                return i, taxis
            if d0 < 0:
                d0 += ndim
            if d1 < 0:
                d1 += ndim
            if taxis == d0:
                taxis = d1
            elif taxis == d1:
                taxis = d0
        elif name in ("identity", "gradx", "mul-noise"):
            pass  # elementwise
        else:
            # lstm/gru/lstm2d/attn (temporal), flatten/view/res1d/deconv*
            # (unanalyzed) — conservative stop
            return i, taxis
    return len(parsers), taxis


def _suffix_skips_into_prefix(parsers, split: int) -> bool:
    """True if any suffix layer's skip_connect resolves before ``split`` —
    the overlap fast path would hand it history=None (LayerStack runs the
    suffix with start=split and no prefix history).

    A NEGATIVE skip indexes history from the end (Python semantics): at
    layer i the list holds i+1 entries, so it resolves to absolute index
    i+1+skip — identical in the full and suffix runs, and safe whenever
    that lands at/after the split (e.g. skip=-1, a residual on the
    layer's own input, never disables the overlap path)."""
    for i in range(split, len(parsers)):
        skip = parsers[i].extras.get("skip_connect")
        if not isinstance(skip, int):
            continue
        resolved = i + 1 + skip if skip < 0 else skip
        if resolved < split:
            return True
    return False


def _thaw_spec(spec):
    """Specs arrive frozen (hashable) from configs; restore dicts for kwargs."""
    out = []
    for item in spec:
        out.append(_thaw(item) if not isinstance(item, str) else item)
    return out


def freeze_specs(layer_info_list) -> Tuple[Any, ...]:
    """Convert a config layer list into a hashable tuple for module fields."""
    return tuple(_freeze(info) for info in layer_info_list)
