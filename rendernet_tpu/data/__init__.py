"""Host-side data pipeline: pose parsing, tar-streaming loaders, synthetic data."""
from rendernet_tpu.data.pose import (
    pose_from_name,
    pose_to_name_suffix,
    name_to_param,
)
from rendernet_tpu.data.loaders import (
    model_loader,
    data_loader,
    data_loader_image_texture_normal_face,
)
from rendernet_tpu.data.prefetch import prefetch
from rendernet_tpu.data.synthetic import (
    make_synthetic_shader_tar,
    synthetic_face_dataset,
)

__all__ = [
    "pose_from_name",
    "pose_to_name_suffix",
    "name_to_param",
    "model_loader",
    "data_loader",
    "data_loader_image_texture_normal_face",
    "make_synthetic_shader_tar",
    "synthetic_face_dataset",
    "prefetch",
]
