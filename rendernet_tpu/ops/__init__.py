from rendernet_tpu.ops import (
    crops,
    pallas_conv3d,
    pallas_resample,
    phong,
    resample,
    transforms,
)
from rendernet_tpu.ops.pallas_conv3d import nc_conv3d, nc_conv3d_supported
from rendernet_tpu.ops.pallas_resample import (
    rotate_resample_camera_patch_multipass,
    rotate_resample_multipass,
    rotate_resample_to_camera_multipass,
)
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

__all__ = [
    "crops",
    "pallas_conv3d",
    "nc_conv3d",
    "nc_conv3d_supported",
    "pallas_resample",
    "rotate_resample_multipass",
    "rotate_resample_to_camera_multipass",
    "rotate_resample_camera_patch_multipass",
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
]
