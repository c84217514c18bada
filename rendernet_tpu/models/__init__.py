"""Model zoo: RenderNet shader, texture/normal face, and latent decoders."""
from rendernet_tpu.models.shader import (
    ShaderConfig,
    shader_rendernet,
    shader_forward,
    init_shader_params,
)
from rendernet_tpu.models.texture_face import (
    TextureFaceConfig,
    texture_decoder,
    texture_face_rendernet,
    texture_face_forward,
    init_texture_face_params,
)
from rendernet_tpu.models.decoders import (
    shape_decoder_3d,
    init_shape_decoder_params,
    recon_texture_decoder,
    init_recon_texture_decoder_params,
    recon_rendernet,
    init_recon_rendernet_params,
)

__all__ = [
    "ShaderConfig",
    "shader_rendernet",
    "shader_forward",
    "init_shader_params",
    "TextureFaceConfig",
    "texture_decoder",
    "texture_face_rendernet",
    "texture_face_forward",
    "init_texture_face_params",
    "shape_decoder_3d",
    "init_shape_decoder_params",
    "recon_texture_decoder",
    "init_recon_texture_decoder_params",
    "recon_rendernet",
    "init_recon_rendernet_params",
]
