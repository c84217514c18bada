"""Texture/normal face workload: texture decoder + two-head RenderNet.

Architecture-parity targets in RenderNet_Texture_Face_Normal.py:
  * ``decoder_texture`` (:34-46): 199-d Basel-face beta -> FC ->
    [B,32,32,32,4] -> deconv3d(4,s1) -> deconv3d(8,s2) -> conv3d(4,s1),
    PReLU everywhere -> a 64^3 x 4 3D texture grid.
  * two-head ``RenderNet`` (:48-147): a 16-channel encoder variant of the
    shader net whose trunk ends at res3_skip, then two independent decoder
    heads — "Image" (albedo RGB) and "Normal" — each
    conv(128) -> deconv(64,s2)/(32,s2)/(16,s2) -> deconv(3,s1) + sigmoid.

Both the shape voxel grid and the decoded texture grid are independently
rotated+resampled and channel-concatenated before the network (:165-178).
TPU-first design notes as in models/shader.py.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rendernet_tpu.nn.layers import (
    Module,
    Params,
    conv2d,
    conv2d_transpose,
    conv3d,
    conv3d_transpose,
    dropout,
    fully_connected,
    prelu,
    projection_unit,
    res_block_stack,
)
from rendernet_tpu.ops.resample import rotate_resample_to_camera

__all__ = [
    "TextureFaceConfig",
    "texture_decoder",
    "texture_face_rendernet",
    "texture_face_forward",
    "init_texture_face_params",
]


@dataclasses.dataclass(frozen=True)
class TextureFaceConfig:
    """Static hyperparameters; defaults reproduce the reference exactly."""

    texture_dim: int = 199
    # Texture-decoder base grid: the FC emits tex_base^3 x 4 and stride-2
    # deconvs double it until tex_grid. (32, 64) reproduces the reference
    # exactly (:34-46 — one doubling, identical param paths); a smaller
    # tex_base shrinks the dominant FC for committable tiny nets while
    # KEEPING the final 64^3 grid, which must match the shape grid's
    # physical extent (the resampler keeps unit voxel spacing).
    tex_base: int = 32
    tex_grid: int = 64
    keep_prob: float = 1.0
    enc_channels: Tuple[int, int, int] = (8, 16, 16)
    res1_blocks: int = 10
    res2_blocks: int = 10
    res3_blocks: int = 5
    base: int = 32
    new_size: int = 128
    # Rematerialize each res block in the backward pass (jax.checkpoint) —
    # same trade-off as ShaderConfig.remat; required for full-512 texture
    # training on a 16 GB chip.
    remat: bool = False
    # See ShaderConfig.preact_policy: save only conv1 pre-activations in
    # the res stacks, recompute the activation in backward (bit-identical,
    # no conv recompute). Subsumed by ``remat``.
    preact_policy: bool = False
    # See ShaderConfig.scan_blocks (same trade-off).
    scan_blocks: bool = False


def texture_decoder(
    m: Module, z: jnp.ndarray, tex_base: int = 32, tex_grid: int = 64
) -> jnp.ndarray:
    """Texture code -> [B, tex_grid, tex_grid, tex_grid, 4] 3D texture grid.

    Defaults (32, 64) reproduce the reference exactly — FC -> 32^3x4 ->
    deconv(4,s1) -> deconv(8,s2) -> conv(4,s1) -> 64^3x4, identical param
    paths. Smaller tex_base adds stride-2 doublings (scopes e_tex_conv1,
    e_tex_conv1_2, ...) so the output grid — and hence its physical
    extent under resampling — stays 64^3."""
    b = z.shape[0]
    g = tex_base
    if tex_grid % g or (tex_grid // g) & (tex_grid // g - 1):
        raise ValueError(f"tex_grid {tex_grid} must be tex_base {g} * 2^k")
    doublings = (tex_grid // g).bit_length() - 1
    if doublings < 1:
        raise ValueError("tex_grid must be at least 2*tex_base")
    with m.scope("texture_encoder"):
        with m.scope("e_tex_fc1"):
            x = fully_connected(m, z, g * g * g * 4, scope="fully_connected")
            x = prelu(m, x)
            x = x.reshape(b, g, g, g, 4)
        with m.scope("e_tex_conv0"):
            x = conv3d_transpose(
                m, x, 4, (4, 4, 4), (1, 1, 1), scope="conv3d_transpose"
            )
            x = prelu(m, x)
        for d in range(doublings):
            with m.scope("e_tex_conv1" if d == 0 else f"e_tex_conv1_{d + 1}"):
                x = conv3d_transpose(
                    m, x, 8, (4, 4, 4), (2, 2, 2), scope="conv3d_transpose"
                )
                x = prelu(m, x)
        with m.scope("e_tex_conv2"):
            x = conv3d(m, x, 4, (4, 4, 4), (1, 1, 1), scope="conv3d")
            x = prelu(m, x)
    return x


def _decoder_head(
    m: Module, trunk: jnp.ndarray, head: str, suffix: str, cfg: TextureFaceConfig
) -> jnp.ndarray:
    """One output head ("Image" suffix "_1" / "Normal" suffix "_2")."""
    b = cfg.base
    kp = cfg.keep_prob
    with m.scope(head):
        with m.scope(f"e_conv6{suffix}"):
            x = conv2d(m, trunk, b * 4, (4, 4), (1, 1), scope=f"e_conv6{suffix}")
            x = dropout(m, prelu(m, x), kp)
        with m.scope(f"e_conv7{suffix}"):
            # NB the reference names the inner scope 'e_conv7_2' in BOTH heads
            # (RenderNet_Texture_Face_Normal.py:118,135) — a latent quirk we
            # reproduce for npz-key parity.
            x = conv2d_transpose(m, x, b * 2, (4, 4), (2, 2), scope="e_conv7_2")
            x = dropout(m, prelu(m, x), kp)
        with m.scope(f"e_conv8{suffix}"):
            x = conv2d_transpose(m, x, b, (4, 4), (2, 2), scope="conv2d_transpose" if suffix == "_1" else f"e_conv8{suffix}")
            x = dropout(m, prelu(m, x), kp)
        with m.scope(f"e_conv9{suffix}"):
            x = conv2d_transpose(m, x, 16, (4, 4), (2, 2), scope="conv2d_transpose" if suffix == "_1" else f"e_conv9{suffix}")
            x = dropout(m, prelu(m, x), kp)
        with m.scope(f"e_conv10{suffix}"):
            x = conv2d_transpose(m, x, 3, (4, 4), (1, 1), scope="conv2d_transpose" if suffix == "_1" else f"e_conv10{suffix}")
    return jax.nn.sigmoid(x.astype(jnp.float32))


def texture_face_rendernet(
    m: Module, vox: jnp.ndarray, cfg: TextureFaceConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-head render: camera-aligned [B,H,W,D,5] grid -> (albedo, normal).

    Trunk mirrors the shader net at 16 channels; heads are independent.
    """
    kp = cfg.keep_prob
    c1, c2, c3 = cfg.enc_channels
    with m.scope("encoder"):
        with m.scope("e_conv1"):
            x = conv3d(m, vox, c1, (5, 5, 5), (2, 2, 2), scope="e_conv1")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv2"):
            x = conv3d(m, x, c2, (3, 3, 3), (1, 1, 2), scope="e_conv2")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv3"):
            x = conv3d(m, x, c3, (3, 3, 3), (1, 1, 1), scope="e_conv3")
            x = dropout(m, prelu(m, x), kp)

        shortcut = x
        x = res_block_stack(
            m, x, cfg.res1_blocks, c3, "res1_{}", ndim=3,
            use_scan=cfg.scan_blocks, remat=cfg.remat,
            preact=cfg.preact_policy,
        )
        with m.scope("res1_skip"):
            x = conv3d(m, x, c3, (3, 3, 3), (1, 1, 1), scope="con1_3X3")
        x = (x.astype(jnp.float32) + shortcut.astype(jnp.float32)).astype(
            m.compute_dtype
        )

        x = projection_unit(m, x)
        nf = x.shape[-1]  # 512 for a 128-deep grid at 16 channels

        shortcut = x
        x = res_block_stack(
            m, x, cfg.res2_blocks, nf, "res2_{}", ndim=2,
            use_scan=cfg.scan_blocks, remat=cfg.remat,
            preact=cfg.preact_policy,
        )
        with m.scope("res2_skip"):
            x = conv2d(m, x, nf, (3, 3), (1, 1), scope="con1_3X3")
        x = (x.astype(jnp.float32) + shortcut.astype(jnp.float32)).astype(
            m.compute_dtype
        )

        b = cfg.base
        with m.scope("e_conv5"):
            x = conv2d(m, x, b * 8, (4, 4), (1, 1), scope="e_conv5")
            x = dropout(m, prelu(m, x), kp)
        shortcut = x
        x = res_block_stack(
            m, x, cfg.res3_blocks, b * 8, "res3_{}", ndim=2,
            use_scan=cfg.scan_blocks, remat=cfg.remat,
            preact=cfg.preact_policy,
        )
        with m.scope("res3_skip"):
            x = conv2d(m, x, b * 8, (3, 3), (1, 1), scope="con1_3X3")
        trunk = (x.astype(jnp.float32) + shortcut.astype(jnp.float32)).astype(
            m.compute_dtype
        )

        albedo = _decoder_head(m, trunk, "Image", "_1", cfg)
        normal = _decoder_head(m, trunk, "Normal", "_2", cfg)
    return albedo, normal


def texture_face_forward(
    params: Params,
    voxels: jnp.ndarray,
    texture_code: jnp.ndarray,
    view_params: jnp.ndarray,
    cfg: TextureFaceConfig,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    resample: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full pipeline (RenderNet_Texture_Face_Normal.py:165-179): decode the
    texture grid, independently rotate+resample shape and texture, concat on
    channel, run the two-head network. Returns (albedo, normal).

    ``resample``: "exact" (direct trilinear — reference bit-parity) or
    "multipass" (the fast Pallas kernel; see shader_forward — required in
    practice for repeated 512px renders, e.g. the inverse-rendering inner
    loop, where the exact gather program is pathological on TPU)."""
    m = Module(
        params=params,
        compute_dtype=compute_dtype,
        train=train,
        dropout_rng=dropout_rng,
    )
    tex_grid = texture_decoder(
        m, texture_code.astype(compute_dtype), tex_base=cfg.tex_base,
        tex_grid=cfg.tex_grid,
    )
    if resample == "multipass":
        from rendernet_tpu.ops.pallas_resample import (
            rotate_resample_to_camera_multipass,
        )

        def warp(g):
            return rotate_resample_to_camera_multipass(
                g, view_params, new_size=cfg.new_size,
                compute_dtype=compute_dtype,
            )
    else:
        def warp(g):
            return rotate_resample_to_camera(
                g, view_params, new_size=cfg.new_size
            )

    shape_cam = warp(voxels)
    tex_cam = warp(tex_grid.astype(jnp.float32))
    both = jnp.concatenate([shape_cam, tex_cam], axis=4).astype(compute_dtype)
    return texture_face_rendernet(m, both, cfg)


def init_texture_face_params(rng: jax.Array, cfg: TextureFaceConfig) -> Params:
    m = Module(rng=rng)
    tex = texture_decoder(
        m, jnp.zeros((1, cfg.texture_dim), jnp.float32), tex_base=cfg.tex_base,
        tex_grid=cfg.tex_grid,
    )
    del tex
    dummy = jnp.zeros((1, 8, 8, cfg.new_size, 5), jnp.float32)
    texture_face_rendernet(m, dummy, cfg)
    return m.params
