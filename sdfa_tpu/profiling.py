"""Profiling/tracing utilities.

Reference aux subsystem (SURVEY.md §5 "Tracing / profiling"): TorchScript
trace is a product feature (covered by api.trace_model) and wall-clock
micro-profiling (`saber.log.timeit`, covered by utils.log.timeit).  This
module adds the TPU-native instruments: jax.profiler traces viewable in
TensorBoard/Perfetto and compiled-program cost introspection.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, Optional

from .utils import log


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sdfa_profile"):
    """Capture a device trace: `with profiling.trace(): run_steps()`.

    View with TensorBoard's profile plugin or Perfetto.
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info(f"profiler trace written to {log_dir}")


def start_trace(log_dir: str = "/tmp/sdfa_profile") -> str:
    """Imperative variant of :func:`trace` for open-ended capture windows
    (used by the trainer's `trainer.profile` hparam)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    return log_dir


def stop_trace() -> None:
    import jax

    jax.profiler.stop_trace()


def cost_analysis(fn, *example_args) -> Dict[str, Any]:
    """AOT-compile ``fn`` and return XLA's flops/bytes estimates."""
    import jax

    compiled = jax.jit(fn).lower(*example_args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0]
    return dict(costs or {})


def memory_analysis(fn, *example_args) -> Optional[Any]:
    import jax

    compiled = jax.jit(fn).lower(*example_args).compile()
    return compiled.memory_analysis()


def device_memory_stats() -> Dict[str, Any]:
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats or {})
