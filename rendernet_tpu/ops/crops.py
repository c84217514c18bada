"""Synchronized random/center crops for patch-curriculum training.

Capability-parity targets: ``tools/model_util.py`` —
``tf_random_crop_voxel_image`` (:77-100), ``tf_random_crop_voxel_texture_image``
(:102-129), ``tf_random_crop_voxel_texture_image_normal`` (:131-161),
center-crop variants (:185-245), ``center_pad_binvox_cube`` (:318-329).

TPU re-design: the reference feeds ``patch_size`` as a runtime placeholder;
XLA needs static shapes, so here ``patch_size`` is a Python int (the
curriculum 32 -> 64 -> full is a small set of jit specializations) while the
random crop OFFSET stays traced (``lax.dynamic_slice`` with jax.random
offsets) — so no retrace per step, and fully jit-compatible.

Crops are spatial (H, W) only; the depth axis is never cropped (matching the
reference — the projection unit needs full depth). Image crops are the voxel
crop scaled by ``image_dim // voxel_dim``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "random_crop_offsets",
    "crop_voxel",
    "crop_image",
    "random_crop_voxel_image",
    "random_crop_voxel_texture_image",
    "random_crop_voxel_texture_image_normal",
    "center_crop_voxel_image",
    "center_crop_voxel",
    "center_crop_image",
    "center_pad_cube",
]


def random_crop_offsets(
    key: jax.Array, voxel_dim: int, patch_size: int
) -> jnp.ndarray:
    """Two random crop-start offsets in [0, voxel_dim - patch_size]."""
    return jax.random.randint(key, (2,), 0, voxel_dim - patch_size + 1)


def crop_voxel(
    voxels: jnp.ndarray, offsets: jnp.ndarray, patch_size: int
) -> jnp.ndarray:
    """Crop ``[B, H, W, D, C]`` voxels at traced (H, W) offsets."""
    b, _, _, d, c = voxels.shape
    return lax.dynamic_slice(
        voxels,
        (jnp.int32(0), offsets[0], offsets[1], jnp.int32(0), jnp.int32(0)),
        (b, patch_size, patch_size, d, c),
    )


def crop_image(
    images: jnp.ndarray, offsets: jnp.ndarray, patch_size: int, factor: int
) -> jnp.ndarray:
    """Crop ``[B, H, W, C]`` images at voxel offsets scaled by ``factor``."""
    b, _, _, c = images.shape
    return lax.dynamic_slice(
        images,
        (jnp.int32(0), offsets[0] * factor, offsets[1] * factor, jnp.int32(0)),
        (b, patch_size * factor, patch_size * factor, c),
    )


def random_crop_voxel_image(
    key: jax.Array, voxels: jnp.ndarray, images: jnp.ndarray, patch_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Synchronized random (voxel, image) crop — tf_random_crop_voxel_image."""
    voxel_dim = voxels.shape[1]
    if patch_size == voxel_dim:
        return voxels, images
    factor = images.shape[1] // voxel_dim
    offsets = random_crop_offsets(key, voxel_dim, patch_size)
    return (
        crop_voxel(voxels, offsets, patch_size),
        crop_image(images, offsets, patch_size, factor),
    )


def random_crop_voxel_texture_image(
    key: jax.Array,
    voxels: jnp.ndarray,
    texture: jnp.ndarray,
    images: jnp.ndarray,
    patch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    voxel_dim = voxels.shape[1]
    if patch_size == voxel_dim:
        return voxels, texture, images
    factor = images.shape[1] // voxel_dim
    offsets = random_crop_offsets(key, voxel_dim, patch_size)
    return (
        crop_voxel(voxels, offsets, patch_size),
        crop_voxel(texture, offsets, patch_size),
        crop_image(images, offsets, patch_size, factor),
    )


def random_crop_voxel_texture_image_normal(
    key: jax.Array,
    voxels: jnp.ndarray,
    texture: jnp.ndarray,
    images: jnp.ndarray,
    normals: jnp.ndarray,
    patch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    voxel_dim = voxels.shape[1]
    if patch_size == voxel_dim:
        return voxels, texture, images, normals
    factor = images.shape[1] // voxel_dim
    offsets = random_crop_offsets(key, voxel_dim, patch_size)
    return (
        crop_voxel(voxels, offsets, patch_size),
        crop_voxel(texture, offsets, patch_size),
        crop_image(images, offsets, patch_size, factor),
        crop_image(normals, offsets, patch_size, factor),
    )


def center_crop_voxel(voxels: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    start = voxels.shape[1] // 2 - patch_size // 2
    return voxels[:, start : start + patch_size, start : start + patch_size]


def center_crop_image(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    start = images.shape[1] // 2 - patch_size // 2
    return images[:, start : start + patch_size, start : start + patch_size]


def center_crop_voxel_image(
    voxels: jnp.ndarray, images: jnp.ndarray, patch_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    factor = images.shape[1] // voxels.shape[1]
    return (
        center_crop_voxel(voxels, patch_size),
        center_crop_image(images, patch_size * factor),
    )


def center_pad_cube(voxels: np.ndarray) -> np.ndarray:
    """Zero-pad a dense array to a cube (host-side; model_util.py:318-329)."""
    cube = max(voxels.shape)
    before = [(cube - e) // 2 for e in voxels.shape]
    after = [cube - e - b for e, b in zip(voxels.shape, before)]
    return np.pad(voxels, list(zip(before, after)), "constant")
