"""Import/export of the reference's npz weight-dictionary format.

The reference persists pretrained weights as one ``.npz`` per layer in a
directory, keyed by the TF variable-scope path with the top scope dropped
and '/' replaced by '_' (``tools/model_util.py:26-39`` loads them;
``Reconstruct_RenderNet_Face.py:43-299`` consumes keys like
``e_conv1_e_conv1_weights``, ``res1_skip_con1_3X3_weights``,
``Image_e_conv6_1_alpha``, ``g_zP_g_gc1_weights``).

Because this framework's parameter paths mirror the TF scopes exactly
(``encoder/e_conv1/e_conv1/weights``), translation is a pure key mapping —
no tensor transposes are needed: TF conv kernels are HWIO / DHWIO and
deconvs are spatial+(out,in), which is precisely the layout our layers use.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Iterable, Optional

import numpy as np

from rendernet_tpu.nn.layers import Params

__all__ = [
    "load_reference_weight_dir",
    "npz_key_for_path",
    "params_from_weight_dict",
    "weight_dict_from_params",
    "export_reference_weight_dir",
]

_TOP_SCOPES = ("encoder", "texture_encoder")


def load_reference_weight_dir(weight_dir: str) -> Dict[str, np.ndarray]:
    """Load a directory of ``*.txt.npz`` files into {layer_key: array}.

    Mirrors ``load_weights`` (tools/model_util.py:26-39): the key is the
    basename up to the first '.', the value is ``arr_0``.
    """
    out: Dict[str, np.ndarray] = {}
    for path in glob.glob(os.path.join(weight_dir, "*.txt.npz")):
        with np.load(path) as data:
            key = os.path.basename(path).split(".")[0]
            out[key] = data["arr_0"]
    return out


def npz_key_for_path(path: str) -> str:
    """Parameter path -> reference npz key.

    Drops a leading top scope ('encoder/', 'texture_encoder/') and joins the
    rest with '_': ``encoder/Image/e_conv6_1/alpha -> Image_e_conv6_1_alpha``.
    """
    parts = path.split("/")
    if parts[0] in _TOP_SCOPES:
        parts = parts[1:]
    return "_".join(parts)


def params_from_weight_dict(
    template: Params,
    weight_dict: Dict[str, np.ndarray],
    strict: bool = True,
) -> Params:
    """Fill a param pytree (shapes from ``template``) from a weight dict.

    ``strict=True`` raises on missing keys or shape mismatches; otherwise
    missing entries keep the template value (useful for partial loads).
    """
    out: Params = {}
    missing = []
    for path, value in template.items():
        key = npz_key_for_path(path)
        if key in weight_dict:
            arr = np.asarray(weight_dict[key], np.float32)
            if arr.shape != tuple(value.shape):
                if arr.size == value.size:
                    arr = arr.reshape(value.shape)
                elif strict:
                    raise ValueError(
                        f"shape mismatch for {path} ({key}): "
                        f"{arr.shape} vs {tuple(value.shape)}"
                    )
            out[path] = arr
        else:
            missing.append(key)
            out[path] = np.asarray(value)
    if strict and missing:
        raise KeyError(f"weight dict missing {len(missing)} keys, e.g. {missing[:5]}")
    return out


def weight_dict_from_params(params: Params) -> Dict[str, np.ndarray]:
    """Inverse translation: param pytree -> reference-keyed weight dict."""
    return {npz_key_for_path(p): np.asarray(v) for p, v in params.items()}


def export_reference_weight_dir(
    params: Params, out_dir: str, keys: Optional[Iterable[str]] = None
) -> None:
    """Write params as the reference's directory-of-npz format
    (one ``<key>.txt.npz`` per parameter, array under ``arr_0``)."""
    os.makedirs(out_dir, exist_ok=True)
    wd = weight_dict_from_params(params)
    for key, arr in wd.items():
        if keys is not None and key not in keys:
            continue
        np.savez(os.path.join(out_dir, key + ".txt.npz"), arr)
