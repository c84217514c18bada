"""rendernet_tpu — a TPU-native differentiable rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
thunguyenphuoc/RenderNet (NeurIPS 2018): differentiable voxel rendering via a
rigid-body pose transform + trilinear resample, a learned projection unit,
conv encoder/decoder rendering networks, Phong shading, full training
workloads (shader, texture/normal face), gradient-based inverse rendering,
and multi-chip data parallelism over a jax.sharding Mesh.
"""

__version__ = "0.1.0"

from rendernet_tpu.io import binvox
from rendernet_tpu.io.binvox import (
    Voxels,
    load_binvox,
    read_as_3d_array,
    read_as_coord_array,
    save_binvox,
)
from rendernet_tpu.io.tar_archive import NpyTarReader, NpyTarWriter
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
from rendernet_tpu.ops import crops, phong, resample, transforms
from rendernet_tpu.ops.resample import (
    affine_resample,
    rotate_resample,
    rotate_resample_to_camera,
    trilinear_gather,
)
from rendernet_tpu.ops.transforms import (
    grid_to_grid_matrix,
    image_to_voxel_axes,
    pose_matrix,
    silhouette,
    voxel_to_image_axes,
)
from rendernet_tpu import compat, data, models, recon, train
from rendernet_tpu.ops.pallas_resample import (
    rotate_resample_camera_patch_multipass,
    rotate_resample_multipass,
    rotate_resample_to_camera_multipass,
)
from rendernet_tpu.utils.image import decode_image, encode_png, save_image, to_uint8

__all__ = [
    "binvox",
    "Voxels",
    "load_binvox",
    "read_as_3d_array",
    "read_as_coord_array",
    "save_binvox",
    "NpyTarReader",
    "NpyTarWriter",
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
    "crops",
    "phong",
    "resample",
    "transforms",
    "affine_resample",
    "rotate_resample",
    "rotate_resample_to_camera",
    "trilinear_gather",
    "grid_to_grid_matrix",
    "image_to_voxel_axes",
    "pose_matrix",
    "silhouette",
    "voxel_to_image_axes",
    "models",
    "compat",
    "data",
    "recon",
    "train",
    "rotate_resample_multipass",
    "rotate_resample_to_camera_multipass",
    "rotate_resample_camera_patch_multipass",
    "decode_image",
    "encode_png",
    "save_image",
    "to_uint8",
]
