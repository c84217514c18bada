"""Device-mesh data parallelism (no reference counterpart — SURVEY.md §2).

The reference is single-GPU; here scaling is first-class: a
``jax.sharding.Mesh`` with a ``('data', 'model')`` axis space, batches
sharded over 'data', parameters replicated, and gradient all-reduce emitted
by XLA as ICI collectives when the jitted step consumes sharded batches with
replicated params. No hand-written collectives are needed, but the
all-reduce is NOT tiny: the shader net measures 237 M params, a ~1.66 GB
fp32 gradient all-reduce per step (benchmarks/results/scaling_model_r3.json).
Within a slice that rides ICI and stays <2% of the step even unoverlapped.
Across hosts it crosses DCN once per slice (hybrid mesh below), and the
scaling case rests on the MEASURED zero-overlap bound, not on collective
overlap: benchmarks/overlap_check.py found `n_async=0` in the compiled
HLO even with the latency-hiding-scheduler flags
(benchmarks/results/overlap_check_v5e_r4.json), so the >85% two-host
north star is carried by bf16 gradient all-reduce
(``TrainConfig.allreduce_dtype``, measured bytes) plus the step's own
length: 93.9% at patch-64 and 98.5% at full-512 with zero overlap
(scaling_model_r4.json). If a future XLA version does emit async
all-reduce spans, that is upside on top of the bound, not a dependency.

Multi-host: ``initialize_multihost`` brings up the jax.distributed runtime
(coordinator handshake), ``make_hybrid_mesh`` lays the data axis out
DCN-major/ICI-minor so the gradient all-reduce rides ICI within a slice and
only crosses DCN once per slice, and ``shard_host_local_batch`` assembles
global batches from per-process local input pipelines
(``jax.make_array_from_process_local_data``) so no host ever materializes
the global batch.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_multihost",
    "make_mesh",
    "make_hybrid_mesh",
    "data_sharding",
    "spatial_sharding",
    "shard_batch",
    "shard_host_local_batch",
    "replicate",
    "process_shard",
]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bring up the jax.distributed runtime for a multi-host run.

    Returns True when initialization happened. A no-op (False) when the run
    is single-process and nothing is configured — safe to call
    unconditionally from CLIs. Explicit args win; otherwise the standard
    env vars (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID`` or a cloud-TPU metadata server) trigger autodetect
    inside ``jax.distributed.initialize``.
    """
    configured = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ) or os.environ.get("COORDINATOR_ADDRESS")
    if not configured:
        return False
    if jax.distributed.is_initialized():  # already up
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


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


def make_hybrid_mesh(
    n_model: int = 1, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Topology-aware ('data', 'model') mesh.

    Within one slice/host group the layout follows the physical ICI torus
    (``mesh_utils.create_device_mesh``); across slices connected by DCN it
    uses ``create_hybrid_device_mesh`` with the data axis DCN-major — so
    the per-step gradient all-reduce reduces within each slice over ICI
    first and crosses DCN only with the slice-reduced tensor. Falls back to
    :func:`make_mesh` where topology info is unavailable (CPU meshes).
    """
    from jax.experimental import mesh_utils

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
    num_slices = len(slice_ids)
    try:
        if num_slices > 1:
            per_slice = n // num_slices
            arr = mesh_utils.create_hybrid_device_mesh(
                (per_slice // n_model, n_model),
                (num_slices, 1),
                devices=devices,
            )
        else:
            arr = mesh_utils.create_device_mesh(
                (n // n_model, n_model), devices=devices
            )
    except (ValueError, NotImplementedError):
        return make_mesh(n_model=n_model, devices=devices)
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
    """Device-put every array in a pytree with batch-axis sharding.

    Single-process: plain sharded device_put of the (globally visible)
    batch. Multi-process: delegates to :func:`shard_host_local_batch` —
    the input is this host's shard and the global array is assembled
    without any host seeing the full batch.
    """
    if jax.process_count() > 1:
        return shard_host_local_batch(mesh, batch)
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def shard_host_local_batch(mesh: Mesh, batch: Any) -> Any:
    """Assemble global batch arrays from per-process local shards.

    Each process passes only its own slice of the batch (global batch =
    process_count * local batch, in process-index order along axis 0);
    ``jax.make_array_from_process_local_data`` builds the global
    batch-sharded jax.Arrays backed by this host's addressable devices.
    """
    def put(x):
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, np.ndim(x)), np.asarray(x)
        )

    return jax.tree.map(put, batch)


def process_shard(batch_size: int) -> Tuple[int, int, int]:
    """(local_batch, process_index, process_count) for a global batch size.

    Data loaders stride the dataset by (index, count) so each host reads
    a disjoint subset and feeds local_batch samples per step.
    """
    n, i = jax.process_count(), jax.process_index()
    if batch_size % n:
        raise ValueError(
            f"global batch {batch_size} not divisible by {n} processes"
        )
    return batch_size // n, i, n


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
