"""Checkpoint / weight persistence.

Three mechanisms, mirroring the reference's trio (SURVEY.md §5):
  1. Orbax checkpoints of the full TrainState (params + opt state + step) —
     the crash-resume path (reference: tf.train.Supervisor autosave).
  2. Flat ``.npz`` parameter archives — the cross-model transfer format
     (reference: per-layer ``*.txt.npz`` dicts, tools/model_util.py:26-39).
     Both a single-file form and the reference's directory-of-files form are
     supported (see rendernet_tpu.compat for TF-name translation).
  3. (Deployment freeze has no TF-GraphDef analog; a jitted function + npz
     weights is the export story.)
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "save_params_npz",
    "load_params_npz",
]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Save any pytree (e.g. TrainState) to a checkpoint.

    Single process: an Orbax checkpoint directory. Multi-host: the chief
    writes one flat ``.npz`` of numbered leaves instead — params/opt state
    are replicated (train.distributed.replicate) so every host holds the
    full state, and Orbax's save runs global sync barriers that a
    chief-only call would deadlock on, while all-hosts Orbax saves of
    host-local numpy trees would race on the same files. The tree is
    stored as numbered leaves either way so arbitrary containers
    (NamedTuples, optax states) round-trip; restore with a ``target`` of
    the same structure. For a human-inspectable params archive use
    :func:`save_params_npz`.
    """
    path = os.path.abspath(path)
    leaves = jax.tree.leaves(state)
    numbered = {str(i): np.asarray(leaf) for i, leaf in enumerate(leaves)}
    if jax.process_count() > 1:
        if jax.process_index() == 0:
            tmp = path + ".npz.tmp"
            # write via a file object: np.savez given a NAME not ending in
            # .npz silently appends the suffix, breaking the atomic rename
            with open(tmp, "wb") as f:
                np.savez(f, **numbered)
            os.replace(tmp, path + ".npz")
        return
    _checkpointer().save(path, numbered, force=True)


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a checkpoint; with ``target`` rebuilds its exact structure.

    Reads the multi-host flat ``.npz`` form when present, else the Orbax
    directory."""
    path = os.path.abspath(path)
    if os.path.exists(path + ".npz"):
        with np.load(path + ".npz") as z:
            data = {k: z[k] for k in z.files}
    else:
        data = _checkpointer().restore(path)
    if target is None:
        return data
    leaves = [data[str(i)] for i in range(len(data))]
    import jax.tree_util as jtu

    return jtu.tree_unflatten(jtu.tree_structure(target), leaves)


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    """Save a flat {path: array} param dict as one .npz archive (chief
    process only in multi-host runs — params are replicated)."""
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}
