"""Device-mesh data parallelism (no reference counterpart — SURVEY.md §2).

The reference is single-GPU; here scaling is first-class: a
``jax.sharding.Mesh`` with a ``('data', 'model')`` axis space, batches
sharded over 'data', parameters replicated, and gradient all-reduce emitted
by XLA as ICI collectives when the jitted step consumes sharded batches with
replicated params. No hand-written collectives needed at this model scale
(≈20-40M params — the all-reduce is tiny; efficiency hinges on step overlap).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "spatial_sharding", "shard_batch", "replicate"]


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``n_data=None`` uses every device on the data axis. A model axis is laid
    out minormost so tensor-parallel extensions ride the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    arr = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def spatial_sharding(mesh: Mesh, ndim: int, axis: int = 1) -> NamedSharding:
    """Shard a spatial axis over 'model' — the long-context analog for this
    workload (SURVEY.md section 5): the voxel grid / image rows split across
    devices and XLA inserts halo exchanges for the convolution stacks.
    Raises the per-chip memory ceiling for higher-than-128^3 resolutions."""
    spec = [None] * ndim
    spec[axis] = "model"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put every array in a pytree with batch-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
