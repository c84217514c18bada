"""Differentiable Phong shading.

Shades a normal-map image (normals encoded as ``img - 0.5``) with a diffuse
N.L term, soft background masks, and an ambient/composite step. Semantics
parity: ``tools/Phong_shading.py`` — ``tf_phong_shading`` (:46-86),
``tf_phong_composite`` (:88-113), masks (:24-44), light-position generators
(:115-130, :247-253). Implementation is fresh jnp, batch-native (no
pixel-count repeats — plain broadcasting), differentiable in normals AND
light direction (the inverse-rendering light variable rides through
``generate_light_pos``'s azimuth input).

``np_*`` mirrors are provided for host-side post-processing (demo CLI), like
the reference's numpy twins (:138-253).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "mask_black_background",
    "mask_white_background",
    "phong_shading",
    "phong_composite",
    "generate_light_pos",
    "np_phong_composite",
    "np_generate_light_pos",
    "np_generate_random_light_pos",
]

_SQRT3 = math.sqrt(3.0)


def mask_black_background(images: jnp.ndarray) -> jnp.ndarray:
    """Soft foreground mask for images on a black background ([0,1] input)."""
    norm = jnp.linalg.norm(images, axis=3, keepdims=True)
    return jax_sigmoid(255.0 * norm - 80.0)


def mask_white_background(images: jnp.ndarray) -> jnp.ndarray:
    """Soft foreground mask for images on a white background ([0,1] input)."""
    norm = _SQRT3 - jnp.linalg.norm(images, axis=3, keepdims=True)
    return jax_sigmoid(255.0 * norm - 80.0)


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))


def phong_shading(
    images: jnp.ndarray,
    light_dir: jnp.ndarray,
    light_col: jnp.ndarray,
    k_diffuse: float,
) -> jnp.ndarray:
    """Diffuse N.L shading of a normal-map image batch.

    ``images``: ``[B, H, W, 3]`` in [0,1]; ``light_dir``/``light_col``:
    ``[B, 3]``. Returns shaded ``[B, H, W, 3]`` clipped to [0,1].
    """
    normals = images - 0.5
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    light_dir = light_dir / jnp.linalg.norm(light_dir, axis=-1, keepdims=True)
    # [B,H,W,3] . [B,1,1,3] -> [B,H,W,1]
    diffuse = jnp.sum(normals * light_dir[:, None, None, :], axis=-1, keepdims=True)
    diffuse = jnp.maximum(diffuse, 0.0)
    shaded = k_diffuse * diffuse * light_col[:, None, None, :]
    return jnp.clip(shaded, 0.0, 1.0)


def phong_composite(
    images: jnp.ndarray,
    light_dir: jnp.ndarray,
    light_col: jnp.ndarray,
    ambient: float,
    k_diffuse: float,
    black_background: bool = False,
    with_mask: bool = True,
) -> jnp.ndarray:
    """Composite diffuse shading with a soft background mask.

    ``mask * (ambient + diffuse) + (1 - mask)`` — background stays white.
    """
    diffuse = phong_shading(images, light_dir, light_col, k_diffuse)
    if with_mask:
        mask = (
            mask_black_background(images)
            if black_background
            else mask_white_background(images)
        )
        compos = mask * (ambient + diffuse) + (1.0 - mask)
    else:
        compos = ambient + diffuse
    return jnp.clip(compos, 0.0, 1.0)


def generate_light_pos(
    light_azimuth: jnp.ndarray, light_elevation: float, batch_size: int
) -> jnp.ndarray:
    """Spherical -> cartesian light position; differentiable in azimuth.

    ``light_azimuth``: ``[B, 1]`` radians (the trainable inverse-rendering
    variable); ``light_elevation``: scalar radians. Z-up convention matching
    ``tf_generate_light_pos`` (tools/Phong_shading.py:115-130).
    """
    elev = jnp.full((batch_size, 1), light_elevation, dtype=jnp.float32)
    x = jnp.sin(elev) * jnp.cos(light_azimuth)
    y = jnp.sin(elev) * jnp.sin(light_azimuth)
    z = jnp.cos(elev)
    return jnp.concatenate([x, y, z], axis=1)


# ---------------------------------------------------------------------------
# numpy mirrors (host-side post-processing for the demo CLI)
# ---------------------------------------------------------------------------
def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_mask(images, white_background: bool):
    if white_background:
        norm = np.linalg.norm(1.0 - images, axis=3, keepdims=True)
        return _np_sigmoid(255.0 * norm - 80.0)
    norm = np.linalg.norm(images, axis=3, keepdims=True)
    return _np_sigmoid(255.0 * norm - 150.0)


def np_phong_composite(
    images,
    light_dir,
    light_col,
    ambient,
    k_diffuse,
    background_col: str = "black",
    with_mask: bool = True,
):
    """Host-side composite; mirrors ``np_phong_composite`` semantics
    (tools/Phong_shading.py:202-228) including the black-background mask's
    different bias (150 vs 80)."""
    images = np.asarray(images, np.float64)
    normals = images - 0.5
    normals = normals / np.linalg.norm(normals, axis=-1, keepdims=True)
    light_dir = np.asarray(light_dir, np.float64)
    light_dir = light_dir / np.linalg.norm(light_dir, axis=-1, keepdims=True)
    diffuse = np.sum(normals * light_dir[:, None, None, :], axis=-1, keepdims=True)
    diffuse = np.maximum(diffuse, 0.0)
    diffuse = np.clip(
        k_diffuse * diffuse * np.asarray(light_col)[:, None, None, :], 0.0, 1.0
    )
    if with_mask:
        mask = _np_mask(images, background_col.lower() != "black")
        compos = mask * (ambient + diffuse) + (1.0 - mask)
    else:
        compos = ambient + diffuse
    return np.clip(compos, 0.0, 1.0)


def np_generate_light_pos(elevation: float = 90, azimuth: float = 90) -> np.ndarray:
    """Y-up light position from degrees (demo CLI convention,
    tools/Phong_shading.py:247-253)."""
    el = np.array([[elevation]]) * math.pi / 180.0
    az = np.array([[azimuth]]) * math.pi / 180.0
    x = -np.sin(el) * np.cos(az)
    y = np.cos(el)
    z = -np.sin(el) * np.sin(az)
    return np.hstack((x, y, z))


def np_generate_random_light_pos(
    batch_size: int,
    rng: np.random.Generator,
    elevation_range=(0, 90),
    azimuth_range=(0, 360),
) -> np.ndarray:
    """Random y-up light positions in degrees ranges."""
    el = rng.integers(*elevation_range, size=(batch_size, 1)) * math.pi / 180.0
    az = rng.integers(*azimuth_range, size=(batch_size, 1)) * math.pi / 180.0
    x = -np.sin(el) * np.cos(az)
    y = np.cos(el)
    z = -np.sin(el) * np.sin(az)
    return np.hstack((x, y, z))
