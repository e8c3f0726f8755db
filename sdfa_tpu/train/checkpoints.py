"""Checkpoint I/O with rolling retention and best-metric tracking.

Reference semantics (saber/trainer/manager/checkpoints.py:8-108):
- names ``epoch%04d-step%06d.ckpt`` + a ``last.ckpt`` copy
- rolling retention of ``max_nb`` checkpoints (by step)
- ``best-<metric>.ckpt`` + ``.info`` sidecar on metric improvement
- payload: epoch, global_step, model state, optimizer + scheduler state.

Serialization uses flax msgpack (single portable file, no pickle).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import flax.serialization as fser

from ..utils import log

_CKPT_RE = re.compile(r"epoch(\d+)-step(\d+)\.ckpt$")


def save_checkpoint(
    log_dir: str,
    payload: Dict[str, Any],
    epoch: int,
    step: int,
    max_nb: int = 10,
) -> str:
    os.makedirs(log_dir, exist_ok=True)
    name = f"epoch{epoch:04d}-step{step:06d}.ckpt"
    path = os.path.join(log_dir, name)
    blob = fser.to_bytes(payload)
    with open(path, "wb") as fp:
        fp.write(blob)
    shutil.copyfile(path, os.path.join(log_dir, "last.ckpt"))
    _prune(log_dir, max_nb)
    log.info(f"checkpoint saved: {name}")
    return path


def save_best(log_dir: str, payload: Dict[str, Any], metric_name: str,
              metric_value: float, epoch: int, step: int) -> str:
    path = os.path.join(log_dir, f"best-{metric_name}.ckpt")
    with open(path, "wb") as fp:
        fp.write(fser.to_bytes(payload))
    with open(path + ".info", "w") as fp:
        json.dump(dict(metric=metric_name, value=float(metric_value),
                       epoch=epoch, step=step), fp, indent=2)
    return path


def _prune(log_dir: str, max_nb: int):
    found = []
    for name in os.listdir(log_dir):
        m = _CKPT_RE.match(name)
        if m:
            found.append((int(m.group(2)), name))
    found.sort()
    while len(found) > max_nb:
        _, name = found.pop(0)
        os.remove(os.path.join(log_dir, name))
        log.info(f"pruned old checkpoint: {name}")


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a payload into the given template pytree structure."""
    with open(path, "rb") as fp:
        blob = fp.read()
    return fser.from_bytes(template, blob)


def latest_checkpoint(log_dir: str) -> Optional[str]:
    last = os.path.join(log_dir, "last.ckpt")
    return last if os.path.exists(last) else None
