"""Compatibility shims: reference npz weight dictionaries <-> param pytrees,
and frozen StableHLO deployment artifacts (the frozen-GraphDef analog)."""
from rendernet_tpu.compat.frozen import (
    freeze_fn,
    freeze_shader_render,
    load_frozen,
    save_frozen,
)
from rendernet_tpu.compat.pb_import import (
    load_frozen_graphdef_weights,
    params_from_frozen_pb,
)
from rendernet_tpu.compat.tf_import import (
    load_reference_weight_dir,
    npz_key_for_path,
    params_from_weight_dict,
    weight_dict_from_params,
    export_reference_weight_dir,
)

__all__ = [
    "load_reference_weight_dir",
    "npz_key_for_path",
    "params_from_weight_dict",
    "weight_dict_from_params",
    "export_reference_weight_dir",
    "freeze_fn",
    "freeze_shader_render",
    "save_frozen",
    "load_frozen",
    "load_frozen_graphdef_weights",
    "params_from_frozen_pb",
]
