"""Multi-host (multi-process) data parallelism — the DCN story.

SURVEY.md §5 names the TPU-native equivalent of the reference's
single-node parallelism (saber DataParallel, data_parallel.py:9) for pods:
``jax.distributed.initialize`` joins processes into one JAX runtime, the
mesh spans all hosts' devices over ICI+DCN, and each process feeds its
host-local shard of the global batch via
``jax.make_array_from_process_local_data``.

Single-process runs (this image: one chip / virtual CPU mesh) take the
no-op path — ``maybe_initialize_distributed`` returns False and
``global_batch_from_local`` degrades to a plain ``device_put`` — so the
code path is exercised by the regular test suite while the multi-host
branch stays behind ``trainer.multihost=true``.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import log


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-host JAX runtime when launched across processes.

    With no explicit arguments jax.distributed.initialize auto-discovers
    the cluster from the TPU pod environment. Returns True when a
    multi-process runtime is (already) up, False on a plain single-process
    run — callers need no further branching: ``jax.process_count()`` is
    correct either way.

    NOTE: must not touch jax.process_count()/devices() before initialize —
    that would initialize the XLA backends and make initialize() itself
    fail ("backends already initialized"). Proven for real by
    tools/multiproc_train.py (2 OS processes × 4 virtual CPU devices).
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1  # e.g. initialized by the launcher
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as exc:  # single-process / no coordinator: stay local
        log.info(f"single-process run (distributed init skipped: {exc})")
        return False
    return jax.process_count() > 1


def global_batch_from_local(mesh: Mesh, batch, axis: str = "data"):
    """Assemble a GLOBAL batch-sharded array from each process's local
    shard.

    Every process passes only its local slice of the global batch (global
    batch size = local size × process_count); the result is one logical
    array sharded over ``axis`` across all hosts. On a single process this
    is exactly ``shard_batch`` (device_put with a NamedSharding).
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )


def local_batch_size(global_batch_size: int) -> int:
    """Per-process slice of the global batch (even split required)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} does not split over {n} processes"
    )
    return global_batch_size // n
