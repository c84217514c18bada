"""Differentiable affine voxel-grid resampling (the renderer's core op).

Backward-warps a destination grid through a per-batch affine matrix and
trilinearly interpolates the source grid. Fully differentiable w.r.t. BOTH
the voxel values (scatter-add adjoint through the gather) and the pose
(through the fractional interpolation weights).

Semantics-parity target: ``tf_rotation_resampling`` / ``tf_resampling`` /
``tf_interpolate`` (tools/resampling_voxel_grid.py:381-632). Two deliberate
re-designs for TPU:

  * The reference materializes a homogeneous ``4 x new_size^3`` meshgrid and
    batch-matmuls it (resampling_voxel_grid.py:603-605). Here source
    coordinates are formed by broadcasting three iota vectors against the
    matrix rows — XLA fuses this into the consumer, so the meshgrid never
    exists in HBM.
  * The reference expresses out-of-range handling by clamping corner indices
    and letting the interpolation weights cancel (tf_interpolate
    :417-422,473-482 — weights of a collapsed corner pair sum to zero).
    Here the same function is computed with an explicit per-axis validity
    mask (floor(x) in [0, S-2]) multiplied into the weights, which is
    algebraically identical (including the zero gradient band) but cheaper
    and branch-free on the VPU.

The flat one-axis gather layout (index = (z*S2 + y)*S3 + x over a
``[B, S^3, C]`` view) is chosen because XLA:TPU lowers a single-dimension
``take_along_axis`` to its native gather; eight corner gathers over the same
operand share the fused coordinate computation.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from rendernet_tpu.ops.transforms import grid_to_grid_matrix, voxel_to_image_axes

__all__ = [
    "trilinear_gather",
    "affine_resample",
    "rotate_resample",
    "rotate_resample_to_camera",
    "rotate_resample_camera_patch",
]


def trilinear_gather(
    voxels: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    zs: jnp.ndarray,
) -> jnp.ndarray:
    """Sample ``voxels[b, z, y, x]`` at fractional coordinates.

    ``voxels``: ``[B, S1, S2, S3, C]`` (axis 1 indexed by z, 2 by y, 3 by x —
    the reference's flat-index convention, tf_interpolate :427-449).
    ``xs/ys/zs``: ``[B, ...]`` float coordinate arrays of identical shape.
    Returns ``[B, *coord_shape, C]``. Points whose floor falls outside
    ``[0, S-2]`` on any axis contribute exactly zero.
    """
    b, s1, s2, s3, c = voxels.shape
    coord_shape = xs.shape[1:]
    n = 1
    for d in coord_shape:
        n *= d

    xs = xs.reshape(b, n)
    ys = ys.reshape(b, n)
    zs = zs.reshape(b, n)

    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    z0f = jnp.floor(zs)
    fx = xs - x0f
    fy = ys - y0f
    fz = zs - z0f

    # Per-axis validity: both corners must land inside the grid. Outside this
    # band the reference's clamped-corner weights cancel to zero; the mask
    # reproduces that (value and gradient).
    vx = (x0f >= 0) & (x0f <= s3 - 2)
    vy = (y0f >= 0) & (y0f <= s2 - 2)
    vz = (z0f >= 0) & (z0f <= s1 - 2)
    valid = (vx & vy & vz).astype(voxels.dtype)

    x0 = jnp.clip(x0f.astype(jnp.int32), 0, s3 - 2)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, s2 - 2)
    z0 = jnp.clip(z0f.astype(jnp.int32), 0, s1 - 2)

    flat = voxels.reshape(b, s1 * s2 * s3, c)
    base = (z0 * s2 + y0) * s3 + x0  # [B, N]

    def corner(dz: int, dy: int, dx: int) -> jnp.ndarray:
        idx = base + (dz * s2 + dy) * s3 + dx
        return jnp.take_along_axis(flat, idx[:, :, None], axis=1)

    fx = (fx * valid)[:, :, None]
    fy = (fy * valid)[:, :, None]
    fz = (fz * valid)[:, :, None]
    gx = (valid - fx[:, :, 0])[:, :, None]  # (1 - fx) * valid
    gy = (valid - fy[:, :, 0])[:, :, None]
    gz = (valid - fz[:, :, 0])[:, :, None]

    # Lerp tree: 8 gathers, 7 fused lerps (vs the reference's 8 weight
    # products + add_n) — fewer VPU flops and smaller fusion footprint.
    c00 = corner(0, 0, 0) * gx + corner(0, 0, 1) * fx
    c01 = corner(0, 1, 0) * gx + corner(0, 1, 1) * fx
    c10 = corner(1, 0, 0) * gx + corner(1, 0, 1) * fx
    c11 = corner(1, 1, 0) * gx + corner(1, 1, 1) * fx
    c0 = c00 * gy + c01 * fy
    c1 = c10 * gy + c11 * fy
    out = c0 * gz + c1 * fz
    return out.reshape(b, *coord_shape, c)


def _dst_coords(
    matrix: jnp.ndarray, out_size: Tuple[int, int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Broadcast destination-index iotas through the backward-map matrix.

    Destination point for ``out[b, i, j, k]`` is ``(x=k, y=j, z=i)``; source
    coordinate ``row`` is ``m[b,row,0]*x + m[b,row,1]*y + m[b,row,2]*z +
    m[b,row,3]``. Never materializes a meshgrid.
    """
    d1, d2, d3 = out_size
    ii = jnp.arange(d1, dtype=jnp.float32)[None, :, None, None]
    jj = jnp.arange(d2, dtype=jnp.float32)[None, None, :, None]
    kk = jnp.arange(d3, dtype=jnp.float32)[None, None, None, :]

    def row(r: int) -> jnp.ndarray:
        m = matrix[:, r, :]
        return (
            m[:, 0, None, None, None] * kk
            + m[:, 1, None, None, None] * jj
            + m[:, 2, None, None, None] * ii
            + m[:, 3, None, None, None]
        )

    return row(0), row(1), row(2)


def affine_resample(
    voxels: jnp.ndarray,
    matrix: jnp.ndarray,
    out_size: Sequence[int],
) -> jnp.ndarray:
    """Backward-warp ``voxels`` through ``matrix`` into an ``out_size`` grid.

    ``matrix``: ``[B, 3, 4]`` mapping destination index points to source
    coordinates (see :func:`rendernet_tpu.ops.transforms.grid_to_grid_matrix`).
    Returns ``[B, *out_size, C]``.
    """
    xs, ys, zs = _dst_coords(matrix, tuple(out_size))
    return trilinear_gather(voxels, xs, ys, zs)


def rotate_resample(
    voxels: jnp.ndarray,
    view_params: jnp.ndarray,
    size: int | None = None,
    new_size: int = 128,
) -> jnp.ndarray:
    """Rotate (+scale) a ``[B, S, S, S, C]`` grid into a ``new_size`` grid.

    Drop-in equivalent of ``tf_rotation_resampling``
    (tools/resampling_voxel_grid.py:616-632): pose ``[B, 2|3]`` =
    (azimuth, elevation[, scale]) in radians.
    """
    if size is None:
        size = voxels.shape[1]
    matrix = grid_to_grid_matrix(view_params, size=size, new_size=new_size)
    return affine_resample(voxels, matrix, (new_size,) * 3)


def rotate_resample_to_camera(
    voxels: jnp.ndarray,
    view_params: jnp.ndarray,
    size: int | None = None,
    new_size: int = 128,
) -> jnp.ndarray:
    """Rotate+resample then align axes to image row/column order.

    Fuses ``tf_rotation_resampling`` + ``tf_transform_voxel_to_match_image``
    (RenderNet_Shader.py:150-151) — the standard preprocessing of every
    workload before the conv encoder.
    """
    return voxel_to_image_axes(rotate_resample(voxels, view_params, size, new_size))


def rotate_resample_camera_patch(
    voxels: jnp.ndarray,
    view_params: jnp.ndarray,
    offsets: jnp.ndarray,
    patch_size: int,
    size: int | None = None,
    new_size: int = 128,
) -> jnp.ndarray:
    """Crop-fused resample: bit-identical to
    ``rotate_resample_to_camera(...)[:, u0:u0+P, v0:v0+P]`` but only computes
    the cropped window's gathers — a TPU-first optimization with no reference
    counterpart (the reference resamples the full 128^3 grid and then crops,
    RenderNet_Shader.py:150-154). Cuts the training resample cost by
    ``(new_size/patch_size)^2``.

    ``offsets``: traced int32 ``[2]`` = (u0, v0) crop starts in the
    image-aligned (row, col) axes. Depth is never cropped.
    """
    if size is None:
        size = voxels.shape[1]
    matrix = grid_to_grid_matrix(view_params, size=size, new_size=new_size)
    # Image-aligned grid G[b, u, v, d] equals the raw resample out[b, i, j, k]
    # at (i = v, j = new_size-1-u, k = d) (see voxel_to_image_axes). Generate
    # destination points for the window directly in G's index order.
    p = patch_size
    u = offsets[0] + jnp.arange(p, dtype=jnp.int32)
    v = offsets[1] + jnp.arange(p, dtype=jnp.int32)
    xk = jnp.arange(new_size, dtype=jnp.float32)[None, None, None, :]
    yj = (jnp.float32(new_size - 1) - u.astype(jnp.float32))[None, :, None, None]
    zi = v.astype(jnp.float32)[None, None, :, None]

    def row(r: int) -> jnp.ndarray:
        m = matrix[:, r, :]
        return (
            m[:, 0, None, None, None] * xk
            + m[:, 1, None, None, None] * yj
            + m[:, 2, None, None, None] * zi
            + m[:, 3, None, None, None]
        )

    return trilinear_gather(voxels, row(0), row(1), row(2))
