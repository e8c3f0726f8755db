"""Console/file logger with timing helpers.

Mirrors the surface of the reference logger (/root/reference/saber/utils/log.py:70-182):
``info/warn/error/fatal/assertion``, a ``timeit`` context/decorator and a tqdm
re-export — implemented on plain ANSI codes (no colorama dependency).
"""

from __future__ import annotations

import contextlib
import functools
import os
import sys
import time
from typing import Optional

try:  # tqdm is available in the image; degrade gracefully anyway
    from tqdm import tqdm as _tqdm
except Exception:  # pragma: no cover
    def _tqdm(iterable=None, **kwargs):
        return iterable if iterable is not None else []

tqdm = _tqdm

_COLORS = dict(info="\033[36m", warn="\033[33m", error="\033[31m", fatal="\033[41m")
_RESET = "\033[0m"
_LOG_FILE: Optional[str] = None
_VERBOSE = True


def set_log_file(path: Optional[str]):
    global _LOG_FILE
    _LOG_FILE = path
    if path is not None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)


def set_verbose(flag: bool):
    global _VERBOSE
    _VERBOSE = bool(flag)


def _emit(level: str, *args):
    msg = " ".join(str(a) for a in args)
    line = f"[{level.upper():5s}] {msg}"
    if _VERBOSE or level in ("error", "fatal"):
        color = _COLORS.get(level, "")
        stream = sys.stderr if level in ("error", "fatal") else sys.stdout
        use_color = hasattr(stream, "isatty") and stream.isatty()
        print((color + line + _RESET) if use_color else line, file=stream)
    if _LOG_FILE is not None:
        with open(_LOG_FILE, "a") as fp:
            fp.write(line + "\n")


def info(*args):
    _emit("info", *args)


def warn(*args):
    _emit("warn", *args)


def error(*args):
    _emit("error", *args)


def fatal(*args):
    _emit("fatal", *args)
    raise SystemExit(1)


def assertion(cond, *args):
    if not cond:
        fatal(*args if args else ("assertion failed",))


@contextlib.contextmanager
def timeit(tag: str = "timeit", verbose: bool = True):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if verbose:
        info(f"{tag}: {dt*1000.0:.2f} ms")


def timed(tag: Optional[str] = None):
    """Decorator variant of :func:`timeit`."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with timeit(tag or fn.__qualname__):
                return fn(*args, **kwargs)

        return wrapper

    return deco
