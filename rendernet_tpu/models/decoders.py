"""Pretrained-style latent decoders + the inverse-rendering RenderNet.

Architecture-parity targets in Reconstruct_RenderNet_Face.py:
  * ``decoder_3d_pretrained`` (:31-75): z[B,200] -> FC -> [B,4,4,4,256] ->
    4x elu deconv3d (128/64/32/16, all k4 s2) -> deconv3d(1, s1) + sigmoid
    -> 64^3 occupancy grid.
  * ``texture_decoder_pretrained`` (:77-111): same shape as the fresh texture
    decoder but with the npz scope names used by the released weights
    (``e_tex_dc1/g_gc1``, inner deconv scopes named ``conv2d_transpose``).
  * ``RenderNet_pretrained`` (:113-302): the 16-channel two-head renderer
    whose projection is a RAW reshape + 1x1 ``e_conv4`` conv (no
    projection_unit scope), and whose head outputs are ``e_conv11_1/_2``.

All are pure functions over the flat param pytree; in the inverse-rendering
workload the params are frozen and gradients flow only to the latents.
"""
from __future__ import annotations

from typing import Tuple

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
    res_block_stack,
)

__all__ = [
    "shape_decoder_3d",
    "init_shape_decoder_params",
    "recon_texture_decoder",
    "init_recon_texture_decoder_params",
    "recon_rendernet",
    "init_recon_rendernet_params",
]


def shape_decoder_3d(m: Module, z: jnp.ndarray) -> jnp.ndarray:
    """Latent z [B, 200] -> voxel occupancy grid [B, 64, 64, 64, 1]."""
    b = z.shape[0]
    with m.scope("g_zP"):
        x = fully_connected(m, z, 4 * 4 * 4 * 256, scope="g_gc1")
        x = x.reshape(b, 4, 4, 4, 256)
    for ch, name in ((128, "g_conv1"), (64, "g_conv2"), (32, "g_conv3"), (16, "g_conv4")):
        with m.scope(name):
            x = conv3d_transpose(m, x, ch, (4, 4, 4), (2, 2, 2), scope=name)
            x = jax.nn.elu(x)
    # Final layer lives directly at top level (Reconstruct...:71 — no outer
    # doubling scope).
    x = conv3d_transpose(m, x, 1, (4, 4, 4), (1, 1, 1), scope="g_conv5")
    return jax.nn.sigmoid(x.astype(jnp.float32))


def init_shape_decoder_params(rng: jax.Array, z_dim: int = 200) -> Params:
    m = Module(rng=rng)
    shape_decoder_3d(m, jnp.zeros((1, z_dim), jnp.float32))
    return m.params


def recon_texture_decoder(m: Module, z: jnp.ndarray) -> jnp.ndarray:
    """199-d texture code -> [B, 64, 64, 64, 4], released-weights naming."""
    b = z.shape[0]
    with m.scope("texture_encoder"):
        with m.scope("e_tex_dc1"):
            # NB the reference passes 4*4*4*512 here (:89) but that literal is
            # dead: tf.get_variable ignores the shape when a pretrained
            # initializer array is given, and the reshape below (:93) fixes
            # the true output at 32*32*32*4.
            x = fully_connected(m, z, 32 * 32 * 32 * 4, scope="g_gc1")
            x = prelu(m, x)
            x = x.reshape(b, 32, 32, 32, 4)
        with m.scope("e_tex_conv0"):
            x = conv3d_transpose(
                m, x, 4, (4, 4, 4), (1, 1, 1), scope="conv2d_transpose"
            )
            x = prelu(m, x)
        with m.scope("e_tex_conv1"):
            x = conv3d_transpose(
                m, x, 8, (4, 4, 4), (2, 2, 2), scope="conv2d_transpose"
            )
            x = prelu(m, x)
        with m.scope("e_tex_conv2"):
            x = conv3d(m, x, 4, (4, 4, 4), (1, 1, 1), scope="conv3d")
            x = prelu(m, x)
    return x


def init_recon_texture_decoder_params(rng: jax.Array, texture_dim: int = 199) -> Params:
    m = Module(rng=rng)
    recon_texture_decoder(m, jnp.zeros((1, texture_dim), jnp.float32))
    return m.params


def recon_rendernet(
    m: Module, vox: jnp.ndarray, keep_prob: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse-rendering renderer: [B,H,W,D,5] camera grid -> (albedo, normal).

    Differences from the texture-training net (both per the reference):
    projection is a raw reshape + 1x1 ``e_conv4`` conv (:168-179), and the
    heads' final deconvs are ``e_conv11_1``/``e_conv11_2`` (:256-262,295-301)
    with no e_conv10 stage.
    """
    kp = keep_prob
    with m.scope("encoder"):
        with m.scope("e_conv1"):
            x = conv3d(m, vox, 8, (5, 5, 5), (2, 2, 2), scope="e_conv1")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv2"):
            x = conv3d(m, x, 16, (3, 3, 3), (1, 1, 2), scope="e_conv2")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv3"):
            x = conv3d(m, x, 16, (3, 3, 3), (1, 1, 1), scope="e_conv3")
            x = dropout(m, prelu(m, x), kp)

        shortcut = x
        x = res_block_stack(
            m, x, 10, 16, "res1_{}", ndim=3, activation="relu"
        )
        with m.scope("res1_skip"):
            x = conv3d(m, x, 16, (3, 3, 3), (1, 1, 1), scope="con1_3X3")
        x = (x.astype(jnp.float32) + shortcut.astype(jnp.float32)).astype(
            m.compute_dtype
        )

        # Raw depth collapse (no projection_unit scope): [B,H,W,D,C]->[B,H,W,D*C]
        b, h, w, d, c = x.shape
        x = x.reshape(b, h, w, d * c)
        nf = d * c  # 512 for a 128-deep grid
        with m.scope("e_conv4"):
            x = conv2d(m, x, nf, (1, 1), (1, 1), scope="e_conv4")
            x = dropout(m, prelu(m, x), kp)

        shortcut = x
        x = res_block_stack(
            m, x, 10, nf, "res2_{}", ndim=2, activation="relu"
        )
        with m.scope("res2_skip"):
            x = conv2d(m, x, nf, (3, 3), (1, 1), scope="con1_3X3")
        x = (x.astype(jnp.float32) + shortcut.astype(jnp.float32)).astype(
            m.compute_dtype
        )

        with m.scope("e_conv5"):
            x = conv2d(m, x, 256, (4, 4), (1, 1), scope="e_conv5")
            x = dropout(m, prelu(m, x), kp)
        shortcut = x
        x = res_block_stack(
            m, x, 5, 256, "res3_{}", ndim=2, activation="relu"
        )
        with m.scope("res3_skip"):
            x = conv2d(m, x, 256, (3, 3), (1, 1), scope="con1_3X3")
        trunk = (x.astype(jnp.float32) + shortcut.astype(jnp.float32)).astype(
            m.compute_dtype
        )

        def head(name: str, suffix: str) -> jnp.ndarray:
            with m.scope(name):
                with m.scope(f"e_conv6{suffix}"):
                    y = conv2d(m, trunk, 128, (4, 4), (1, 1), scope=f"e_conv6{suffix}")
                    y = dropout(m, prelu(m, y), kp)
                with m.scope(f"e_conv7{suffix}"):
                    y = conv2d_transpose(m, y, 64, (4, 4), (2, 2), scope=f"e_conv7{suffix}")
                    y = dropout(m, prelu(m, y), kp)
                with m.scope(f"e_conv8{suffix}"):
                    y = conv2d_transpose(m, y, 32, (4, 4), (2, 2), scope=f"e_conv8{suffix}")
                    y = dropout(m, prelu(m, y), kp)
                with m.scope(f"e_conv9{suffix}"):
                    y = conv2d_transpose(m, y, 16, (4, 4), (2, 2), scope=f"e_conv9{suffix}")
                    y = prelu(m, y)
                    if suffix == "_2":
                        y = dropout(m, y, kp)
                # Image head nests e_conv11_1 under 'e_conv11_1'; Normal head
                # nests e_conv11_2 under 'e_conv11' (:256,295 — another quirk).
                outer = f"e_conv11{suffix}" if suffix == "_1" else "e_conv11"
                with m.scope(outer):
                    y = conv2d_transpose(
                        m, y, 3, (4, 4), (1, 1), scope=f"e_conv11{suffix}"
                    )
            return jax.nn.sigmoid(y.astype(jnp.float32))

        albedo = head("Image", "_1")
        normal = head("Normal", "_2")
    return albedo, normal


def init_recon_rendernet_params(
    rng: jax.Array, new_size: int = 128, in_channels: int = 5
) -> Params:
    m = Module(rng=rng)
    dummy = jnp.zeros((1, 8, 8, new_size, in_channels), jnp.float32)
    recon_rendernet(m, dummy)
    return m.params
