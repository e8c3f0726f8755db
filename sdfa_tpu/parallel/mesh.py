"""Device mesh + sharding helpers — the multi-chip story.

The reference's only parallelism is single-process DataParallel
(saber/trainer/saber_model/data_parallel.py:9; SURVEY.md §2.2 S27).  The
TPU-native equivalent is SPMD data parallelism over a jax.sharding.Mesh:
batches are sharded on axis 0 across the ``data`` axis, parameters are
replicated, and gradient reduction is an XLA all-reduce over ICI inserted
automatically by jit from the sharding annotations.

The model here is ~10M params, so no tensor/pipeline parallelism is needed
(SURVEY.md §5) — the mesh abstraction still supports a ``model`` axis for
future families.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along dim 0."""
    sharding = batch_sharding(mesh, axis)

    def _put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_devices(batch, n_devices: int):
    """Pad dim 0 to a multiple of the device count (repeating the tail) so
    uneven batches shard; returns (padded_batch, real_size)."""
    import numpy as np

    def leading(x):
        return x.shape[0]

    sizes = {leading(x) for x in jax.tree_util.tree_leaves(batch)}
    assert len(sizes) == 1, f"inconsistent batch dims: {sizes}"
    n = sizes.pop()
    rem = n % n_devices
    if rem == 0:
        return batch, n
    pad = n_devices - rem

    def _pad(x):
        reps = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        return reps

    return jax.tree_util.tree_map(_pad, batch), n
