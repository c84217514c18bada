"""Frozen deployment artifacts via ``jax.export`` (StableHLO).

The reference deploys by freezing a trained checkpoint into a GraphDef
``.pb`` — ``convert_variables_to_constants(["encoder/output"])`` in
``demo/RenderNet_converter.py:3-18`` — which ``RenderNet_demo.py:23-30``
then loads and runs with **no model code**. The TPU-native equivalent is
``jax.export``: trace the jitted render function with the trained
parameters closed over as constants, serialize the portable StableHLO
artifact, and reload it anywhere (CPU or TPU, any process) without
``rendernet_tpu`` model definitions on the load side.

Differences from the ``.pb`` story, by design:

* the artifact is multi-platform (``platforms=("cpu", "tpu")`` by
  default) — one file serves both a TPU pod and a CPU smoke test;
* shapes are static per artifact (XLA's compilation model); freeze one
  artifact per deployment batch size — the demo's batch is 1;
* the inference pipeline frozen here is the **exact** trilinear resample
  path (pure XLA ops — required for cross-platform portability and for
  bit-parity with pretrained reference weights).

``freeze_shader_render`` is the ``RenderNet_converter`` analog;
``load_frozen(...)`` + ``.call`` is the ``load_graph`` analog.
"""
from __future__ import annotations

import os
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from jax import export as jax_export

__all__ = [
    "freeze_fn",
    "freeze_shader_render",
    "save_frozen",
    "load_frozen",
]


def freeze_fn(
    fn: Callable,
    example_args: Tuple,
    *,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> jax_export.Exported:
    """Export ``fn(*example_args)`` as a portable StableHLO artifact.

    ``fn`` must be jittable and close over any constants (e.g. trained
    params) that should be baked into the artifact. ``example_args`` fix
    the (static) input shapes/dtypes.
    """
    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        tuple(example_args),
    )
    return jax_export.export(jax.jit(fn), platforms=list(platforms))(*specs)


def freeze_shader_render(
    params,
    cfg=None,
    *,
    batch: int = 1,
    voxel_size: int = 64,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> jax_export.Exported:
    """Freeze the full shader render pipeline with ``params`` as constants.

    The frozen signature is ``(voxels[batch, S, S, S, 1] f32,
    pose[batch, 3] f32) -> image`` — the same named feeds the reference's
    frozen graph exposes (``"real_model_in:0"``/``"view_name:0"`` ->
    ``"encoder/output:0"``, RenderNet_demo.py:47-51).
    """
    from rendernet_tpu.models.shader import ShaderConfig, shader_forward

    if cfg is None:
        cfg = ShaderConfig()
    fp32 = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}

    def render(voxels, pose):
        return shader_forward(fp32, voxels, pose, cfg)

    vox = jnp.zeros((batch, voxel_size, voxel_size, voxel_size, 1), jnp.float32)
    pose = jnp.zeros((batch, 3), jnp.float32)
    return freeze_fn(render, (vox, pose), platforms=platforms)


def save_frozen(exported: jax_export.Exported, path: str) -> None:
    """Serialize an exported artifact to ``path`` (atomic write)."""
    data = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_frozen(path: str) -> jax_export.Exported:
    """Load a serialized artifact; run it via ``.call(*args)``.

    The loaded callable is itself jit-traceable, so it can be composed
    into larger jitted programs (e.g. a batched rotate sweep).
    """
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
