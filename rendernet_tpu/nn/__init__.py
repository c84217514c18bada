from rendernet_tpu.nn import init, layers
from rendernet_tpu.nn.layers import (
    Module,
    Params,
    conv2d,
    conv2d_transpose,
    conv3d,
    conv3d_transpose,
    dropout,
    fully_connected,
    lrelu,
    prelu,
    projection_unit,
    res_block_2d,
    res_block_3d,
)

__all__ = [
    "init",
    "layers",
    "Module",
    "Params",
    "conv2d",
    "conv2d_transpose",
    "conv3d",
    "conv3d_transpose",
    "dropout",
    "fully_connected",
    "lrelu",
    "prelu",
    "projection_unit",
    "res_block_2d",
    "res_block_3d",
]
