"""Hierarchical configuration tree.

TPU-native re-design of the reference config system (see
/root/reference/saber/utils/config_dict.py:12-519): a dict subclass with
attribute access, ``.py``/``.json`` loading, recursive ``overwrite_by`` with
``__entirety__`` replace-whole-subtree semantics, ``{VAR}`` substitution and a
JSON dump of the resolved tree.  Values are plain Python/numpy objects so a
ConfigDict is always picklable and hashable-free (never traced by JAX).
"""

from __future__ import annotations

import copy
import importlib.util
import json
import os
import re
from typing import Any, Dict, Iterable, Optional

import numpy as np

_ENTIRETY = "__entirety__"


class ConfigDict(dict):
    """A dict with attribute access and guarded mutation via ``set_key``."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        merged: Dict[str, Any] = {}
        for arg in args:
            if arg is None:
                continue
            if not isinstance(arg, dict):
                raise TypeError(f"ConfigDict positional args must be dicts, got {type(arg)}")
            merged.update(arg)
        merged.update(kwargs)
        for key, val in merged.items():
            super().__setitem__(str(key), self._wrap(val))

    # -- wrapping -----------------------------------------------------------
    @classmethod
    def _wrap(cls, val):
        if isinstance(val, ConfigDict):
            return val
        if isinstance(val, dict):
            return ConfigDict(val)
        if isinstance(val, (list, tuple)):
            return type(val)(cls._wrap(v) for v in val)
        return val

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as exc:
            # name the siblings so a config typo is diagnosable from the
            # message alone (e.g. "audio.feature missing" vs bare "name")
            raise AttributeError(
                f"config key '{name}' not found; available keys: "
                f"{sorted(self.keys())}"
            ) from exc

    def __setattr__(self, name, value):
        raise AttributeError(
            "ConfigDict is immutable via attribute set; use set_key()"
        )

    def __setitem__(self, key, value):
        raise TypeError("ConfigDict is immutable via [] set; use set_key()")

    def set_key(self, key, value):
        """The single sanctioned mutation point (reference: config_dict.py:88-115)."""
        super().__setitem__(str(key), self._wrap(value))

    def delete_key(self, key):
        if key in self:
            super().__delitem__(key)

    # -- queries ------------------------------------------------------------
    def get(self, key, default=None):
        return super().get(key, default)

    def check_keys(self, *keys):
        missing = [k for k in keys if k not in self]
        if missing:
            raise KeyError(f"ConfigDict missing keys: {missing}")
        return True

    def deepcopy(self) -> "ConfigDict":
        return copy.deepcopy(self)

    def __reduce__(self):
        # dict-subclass pickling replays items through the (blocked)
        # __setitem__; reconstruct through __init__ instead so a ConfigDict
        # survives the spawn boundary of data/prefetch.py workers
        return (ConfigDict, (dict(self),))

    def __deepcopy__(self, memo):
        new = ConfigDict()
        for k, v in self.items():
            new.set_key(k, copy.deepcopy(v, memo))
        return new

    # -- merging -------------------------------------------------------------
    def overwrite_by(self, other: dict) -> "ConfigDict":
        """Recursive merge; a sub-dict with ``__entirety__: True`` replaces the
        whole subtree instead of merging (reference: config_dict.py:138-162)."""
        if other is None:
            return self
        for key, val in other.items():
            if key == _ENTIRETY:
                continue
            if (
                isinstance(val, dict)
                and not val.get(_ENTIRETY, False)
                and isinstance(self.get(key), ConfigDict)
            ):
                self[key].overwrite_by(val)
            else:
                if isinstance(val, dict):
                    val = {k: v for k, v in val.items() if k != _ENTIRETY}
                self.set_key(key, val)
        return self

    # -- variable substitution -------------------------------------------------
    def replace_variable(self, name: str, value) -> "ConfigDict":
        """Replace ``{NAME}`` markers in all string leaves
        (reference: config_dict.py:166-199)."""
        marker = "{" + name + "}"

        def _sub(v):
            if isinstance(v, str) and marker in v:
                if v == marker and not isinstance(value, str):
                    return value
                return v.replace(marker, str(value))
            if isinstance(v, ConfigDict):
                for k2, v2 in list(v.items()):
                    v.set_key(k2, _sub(v2))
                return v
            if isinstance(v, (list, tuple)):
                return type(v)(_sub(x) for x in v)
            return v

        for k, v in list(self.items()):
            self.set_key(k, _sub(v))
        return self

    # -- serialization -----------------------------------------------------------
    def to_plain(self) -> dict:
        def _plain(v):
            if isinstance(v, ConfigDict):
                return {k: _plain(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [_plain(x) for x in v]
            if isinstance(v, np.ndarray):
                return v.tolist()
            if isinstance(v, (np.integer,)):
                return int(v)
            if isinstance(v, (np.floating,)):
                return float(v)
            return v

        return {k: _plain(v) for k, v in self.items()}

    def dump(self, path: str):
        with open(path, "w") as fp:
            fp.write(dumps_pretty(self.to_plain()))

    def dumps(self) -> str:
        return dumps_pretty(self.to_plain())

    def __str__(self) -> str:
        return dumps_pretty(self.to_plain())

    # -- loading -------------------------------------------------------------------
    @staticmethod
    def parse_file(path: str) -> "ConfigDict":
        """Load hparams from a ``.py`` module exposing ``hparams`` or a ``.json``
        file (reference: config_dict.py:203-219)."""
        path = os.path.abspath(os.path.expanduser(path))
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        ext = os.path.splitext(path)[1]
        if ext == ".py":
            spec = importlib.util.spec_from_file_location(
                "_sdfa_config_" + re.sub(r"\W", "_", path), path
            )
            module = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(module)
            hp = getattr(module, "hparams", None)
            if hp is None:
                raise ValueError(f"config module {path} does not define `hparams`")
            return ConfigDict(hp)
        if ext == ".json":
            with open(path) as fp:
                return ConfigDict(json.load(fp))
        raise ValueError(f"unsupported config extension: {ext}")


# -- width-aware pretty JSON -----------------------------------------------------
def dumps_pretty(data, indent: int = 2, max_width: int = 120) -> str:
    """Width-aware JSON pretty-printer.

    Matches the reference encoder's observable behavior
    (saber/utils/config_dict.py:252-519): dicts print one key per line at
    ``indent``; a list collapses onto a single line when it fits within
    ``max_width`` minus its indentation and the dict-key prefix, otherwise
    it wraps greedily packing several items per line. Layer-spec tables
    stay one-row-per-layer instead of exploding one-scalar-per-line.
    Output is asserted byte-identical to the imported reference module in
    tests/test_utils.py.
    """
    pad1 = " " * indent

    def _key(k) -> str:
        if isinstance(k, str):
            return k
        if k is True:
            return "true"
        if k is False:
            return "false"
        if k is None:
            return "null"
        if isinstance(k, (int, np.integer)):
            return int.__str__(int(k))
        if isinstance(k, (float, np.floating)):
            return _float_tok(float(k))
        raise TypeError(f"key {k!r} is not a string")

    def _float_tok(v: float) -> str:
        if v != v:
            return "NaN"
        if v == float("inf"):
            return "Infinity"
        if v == float("-inf"):
            return "-Infinity"
        return float.__repr__(v)

    def _scalar_tok(v):
        if isinstance(v, str):
            return json.dumps(v)
        if v is None:
            return "null"
        if v is True:
            return "true"
        if v is False:
            return "false"
        if isinstance(v, (int, np.integer)):
            return int.__str__(int(v))
        if isinstance(v, (float, np.floating)):
            return _float_tok(float(v))
        return None

    def _render(v, level: int, key_width: int = 0) -> str:
        if isinstance(v, np.ndarray):
            v = v.tolist()
        tok = _scalar_tok(v)
        if tok is not None:
            return tok
        if isinstance(v, dict):
            if not v:
                return "{}"
            inner = pad1 * (level + 1)
            parts = []
            for k, val in v.items():
                key_tok = json.dumps(_key(k)) + ": "
                parts.append(key_tok + _render(val, level + 1, len(key_tok)))
            return ("{\n" + inner + (",\n" + inner).join(parts)
                    + "\n" + pad1 * level + "}")
        if isinstance(v, (list, tuple)):
            if not len(v):
                return "[]"
            children = [_render(x, level + 1) for x in v]
            inner_w = indent * (level + 1)
            one_line = "[" + ",".join(children) + "]"
            if len(one_line) <= max_width - inner_w - key_width:
                return one_line
            # greedy wrap: fill each line up to max_width, separator stays
            # on the line it follows
            inner = " " * inner_w
            lines, cur = [], ""
            for child in children:
                cand = (cur + "," + child) if cur else child
                if len(cand) < max_width - inner_w:
                    cur = cand
                else:
                    # an over-long FIRST element flushes an empty cur: emit
                    # the bare-padded line WITHOUT a comma (the reference
                    # encoder does exactly this — still valid JSON; a
                    # trailing "," here would not be)
                    lines.append(inner + cur + ("," if cur else ""))
                    cur = child
            lines.append(inner + cur)
            return "[\n" + "\n".join(lines) + "\n" + pad1 * level + "]"
        # unknown leaf: stringify, like json.dumps(default=str)
        return json.dumps(str(v))

    return _render(data, 0)
