"""Import weights from a frozen TensorFlow GraphDef (``.pb``).

The reference releases its pretrained demo network as a frozen GraphDef
(``convert_variables_to_constants(["encoder/output"])``,
demo/RenderNet_converter.py:3-18; loaded by RenderNet_demo.py:23-30).
Freezing names each Const after the variable it replaced — i.e. the TF
variable-scope path (``encoder/e_conv1/e_conv1/weights``) — which is
exactly this framework's parameter-path convention, so importing is a
name-keyed copy.

TensorFlow is an optional dependency used only here (and only to parse
the protobuf); the compute stack stays JAX.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["load_frozen_graphdef_weights", "params_from_frozen_pb"]


def load_frozen_graphdef_weights(pb_path: str) -> Dict[str, np.ndarray]:
    """Extract every Const tensor from a frozen ``.pb`` as {name: array}."""
    try:
        import tensorflow as tf
    except ImportError as e:  # pragma: no cover - env without TF
        raise RuntimeError(
            "importing a frozen GraphDef requires tensorflow (CPU build is "
            "enough); alternatively export the reference checkpoint to "
            "*.txt.npz files and use load_reference_weight_dir"
        ) from e

    gd = tf.compat.v1.GraphDef()
    with open(pb_path, "rb") as f:
        gd.ParseFromString(f.read())
    out: Dict[str, np.ndarray] = {}
    for node in gd.node:
        if node.op == "Const" and "value" in node.attr:
            try:
                out[node.name] = np.asarray(
                    tf.make_ndarray(node.attr["value"].tensor)
                )
            except Exception:
                continue  # non-tensor consts (e.g. shape metadata)
    return out


def params_from_frozen_pb(
    template: Dict[str, Any], pb_path: str, strict: bool = True
) -> Dict[str, np.ndarray]:
    """Map a frozen pb's Const weights onto ``template``'s param paths.

    Frozen const names match our paths directly; a ``/read`` suffix (some
    freezers keep the read op's name) is tolerated. ``strict`` raises on
    template keys the pb doesn't provide.
    """
    consts = load_frozen_graphdef_weights(pb_path)
    out: Dict[str, np.ndarray] = {}
    missing = []
    for path, value in template.items():
        src = consts.get(path)
        if src is None:
            src = consts.get(path + "/read")
        if src is None:
            missing.append(path)
            out[path] = np.asarray(value)
            continue
        want = tuple(np.shape(value))
        if tuple(src.shape) != want:
            raise ValueError(
                f"{path}: pb tensor shape {src.shape} != template {want}"
            )
        out[path] = src.astype(np.asarray(value).dtype)
    if missing:
        if strict:
            raise KeyError(
                f"frozen pb is missing {len(missing)} params, e.g. {missing[:5]}"
            )
        print(
            f"WARNING: frozen pb provided {len(template) - len(missing)}/"
            f"{len(template)} params; {len(missing)} keep template init, "
            f"e.g. {missing[:3]}"
        )
    return out
