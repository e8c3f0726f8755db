"""Filesystem helpers (reference surface: /root/reference/saber/utils/filesystem.py:7-83)."""

from __future__ import annotations

import os
import re
from typing import Iterable, List, Optional


def ancestor(path: str, level: int = 1) -> str:
    path = os.path.abspath(path)
    for _ in range(level):
        path = os.path.dirname(path)
    return path


def find_files(root: str, pattern: str, recursive: bool = True, abspath: bool = True) -> List[str]:
    """Regex match on file names under ``root``."""
    rx = re.compile(pattern)
    found = []
    if not os.path.isdir(root):
        return found
    if recursive:
        for dirpath, _dirnames, filenames in os.walk(root):
            for name in sorted(filenames):
                if rx.search(name):
                    found.append(os.path.join(dirpath, name))
    else:
        for name in sorted(os.listdir(root)):
            full = os.path.join(root, name)
            if os.path.isfile(full) and rx.search(name):
                found.append(full)
    if not abspath:
        found = [os.path.relpath(p, root) for p in found]
    return sorted(found)


def find_dirs(root: str, pattern: str, recursive: bool = True) -> List[str]:
    rx = re.compile(pattern)
    found = []
    if not os.path.isdir(root):
        return found
    if recursive:
        for dirpath, dirnames, _ in os.walk(root):
            for name in sorted(dirnames):
                if rx.search(name):
                    found.append(os.path.join(dirpath, name))
    else:
        for name in sorted(os.listdir(root)):
            full = os.path.join(root, name)
            if os.path.isdir(full) and rx.search(name):
                found.append(full)
    return sorted(found)


def maybe_in_dirs(
    filename: Optional[str],
    must_in: bool = False,
    possible_roots: Optional[Iterable[str]] = None,
    possible_exts: Optional[Iterable[str]] = None,
) -> Optional[str]:
    """Resolve ``filename`` against candidate roots and extensions
    (reference: filesystem.py:44-83)."""
    if filename is None:
        return None
    candidates = [filename]
    if possible_roots:
        for root in possible_roots:
            candidates.append(os.path.join(root, filename))
    expanded = []
    for cand in candidates:
        expanded.append(cand)
        if possible_exts:
            for ext in possible_exts:
                if not ext.startswith("."):
                    ext = "." + ext
                expanded.append(cand + ext)
    for cand in expanded:
        if os.path.exists(cand):
            return os.path.abspath(cand)
    if must_in:
        raise FileNotFoundError(f"{filename} not found in {possible_roots}")
    return None
