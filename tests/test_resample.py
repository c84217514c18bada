"""Geometry core tests: pose matrices, trilinear resample, gradients.

Oracles are (a) a from-scratch numpy re-statement of the reference math
(tools/resampling_voxel_grid.py semantics) and (b) scipy.ndimage's
affine_transform for interior points.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from rendernet_tpu.ops.resample import (
    affine_resample,
    rotate_resample,
    rotate_resample_to_camera,
)
from rendernet_tpu.ops.transforms import (
    grid_to_grid_matrix,
    image_to_voxel_axes,
    pose_matrix,
    silhouette,
    voxel_to_image_axes,
)


# ---------------------------------------------------------------------------
# numpy oracle: clamp-and-cancel trilinear interpolation, reference semantics
# ---------------------------------------------------------------------------
def np_pose_matrix(azimuth, elevation, scale=None):
    a = azimuth - math.pi * 0.5
    ry = np.array(
        [
            [np.cos(a), 0, -np.sin(a), 0],
            [0, 1, 0, 0],
            [np.sin(a), 0, np.cos(a), 0],
            [0, 0, 0, 1],
        ]
    )
    rz = np.array(
        [
            [np.cos(elevation), np.sin(elevation), 0, 0],
            [-np.sin(elevation), np.cos(elevation), 0, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ]
    )
    m = rz @ ry
    if scale is not None:
        m = np.diag([scale, scale, scale, 1.0]) @ m
    return m


def np_total_inverse(azimuth, elevation, scale, size, new_size):
    t = np.eye(4)
    t[:3, 3] = -size * 0.5
    t_new = np.eye(4)
    t_new[:3, 3] = new_size * 0.5
    total = t_new @ np_pose_matrix(azimuth, elevation, scale) @ t
    return np.linalg.inv(total)


def np_trilinear(vox, xs, ys, zs):
    """Reference-style clamp-and-cancel trilinear sample. vox [S1,S2,S3]."""
    s1, s2, s3 = vox.shape
    x0 = np.floor(xs).astype(int)
    y0 = np.floor(ys).astype(int)
    z0 = np.floor(zs).astype(int)
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1
    x0c = np.clip(x0, 0, s3 - 1)
    x1c = np.clip(x1, 0, s3 - 1)
    y0c = np.clip(y0, 0, s2 - 1)
    y1c = np.clip(y1, 0, s2 - 1)
    z0c = np.clip(z0, 0, s1 - 1)
    z1c = np.clip(z1, 0, s1 - 1)
    out = np.zeros_like(xs, dtype=np.float64)
    corners = [
        (x0c, y0c, z0c),
        (x0c, y1c, z0c),
        (x1c, y0c, z0c),
        (x1c, y1c, z0c),
        (x0c, y0c, z1c),
        (x0c, y1c, z1c),
        (x1c, y0c, z1c),
        (x1c, y1c, z1c),
    ]
    weights = [
        (x1c - xs) * (y1c - ys) * (z1c - zs),
        (x1c - xs) * (ys - y0c) * (z1c - zs),
        (xs - x0c) * (y1c - ys) * (z1c - zs),
        (xs - x0c) * (ys - y0c) * (z1c - zs),
        (x1c - xs) * (y1c - ys) * (zs - z0c),
        (x1c - xs) * (ys - y0c) * (zs - z0c),
        (xs - x0c) * (y1c - ys) * (zs - z0c),
        (xs - x0c) * (ys - y0c) * (zs - z0c),
    ]
    for (xc, yc, zc), w in zip(corners, weights):
        out += w * vox[zc, yc, xc]
    return out


def np_rotate_resample(vox, azimuth, elevation, scale, size, new_size):
    """vox [S,S,S] (axes z,y,x by flat-index convention) -> [NS,NS,NS]."""
    minv = np_total_inverse(azimuth, elevation, scale, size, new_size)[:3, :]
    i, j, k = np.meshgrid(
        np.arange(new_size), np.arange(new_size), np.arange(new_size), indexing="ij"
    )
    pts = np.stack([k, j, i, np.ones_like(i)], 0).reshape(4, -1).astype(np.float64)
    src = minv @ pts
    xs, ys, zs = src[0], src[1], src[2]
    return np_trilinear(vox, xs, ys, zs).reshape(new_size, new_size, new_size)


# ---------------------------------------------------------------------------
def test_identity_pose_centers_grid(rng):
    s, ns = 8, 16
    vox = rng.random((1, s, s, s, 1)).astype(np.float32)
    # azimuth = pi/2 cancels the -pi/2 offset; elevation 0; scale 1.
    params = np.array([[math.pi / 2, 0.0, 1.0]], np.float32)
    out = np.asarray(rotate_resample(jnp.asarray(vox), jnp.asarray(params), s, ns))
    pad = (ns - s) // 2
    # Interior voxels map exactly. The plane at source index S-1 samples at
    # exactly integer S-1, where the reference's clamp-cancel arithmetic
    # yields zero (corner pair collapses, weights cancel) — reproduced here.
    np.testing.assert_allclose(
        out[0, pad : pad + s - 1, pad : pad + s - 1, pad : pad + s - 1, 0],
        vox[0, : s - 1, : s - 1, : s - 1, 0],
        atol=1e-5,
    )
    # everything outside the embedded (interior) cube is zero
    mask = np.ones((ns, ns, ns), bool)
    mask[pad : pad + s - 1, pad : pad + s - 1, pad : pad + s - 1] = False
    assert np.abs(out[0, ..., 0][mask]).max() < 1e-6


def test_matches_numpy_oracle(rng):
    s, ns = 12, 20
    vox = rng.random((2, s, s, s, 1)).astype(np.float32)
    params = np.array(
        [[0.7, 0.3, 1.1], [2.1, -0.4, 0.8]], np.float32
    )
    out = np.asarray(rotate_resample(jnp.asarray(vox), jnp.asarray(params), s, ns))
    for b in range(2):
        oracle = np_rotate_resample(
            vox[b, :, :, :, 0], params[b, 0], params[b, 1], params[b, 2], s, ns
        )
        np.testing.assert_allclose(out[b, :, :, :, 0], oracle, atol=2e-4)


def test_matches_scipy_interior(rng):
    """Cross-check against scipy.ndimage.affine_transform on interior points."""
    s, ns = 16, 24
    vox = rng.random((s, s, s)).astype(np.float64)
    az, el, sc = 1.0, 0.25, 1.0
    minv = np_total_inverse(az, el, sc, s, ns)[:3, :]
    # our convention: input coord order (z,y,x) = rows (2,1,0) of minv,
    # output index order (i,j,k) maps to dst point (x=k, y=j, z=i).
    perm = [2, 1, 0]
    mat = minv[np.ix_(perm, perm)]
    off = minv[perm, 3]
    sp = scipy.ndimage.affine_transform(
        vox, mat, offset=off, output_shape=(ns, ns, ns), order=1, mode="constant"
    )
    params = np.array([[az, el, sc]], np.float32)
    ours = np.asarray(
        rotate_resample(jnp.asarray(vox[None, :, :, :, None], dtype=jnp.float32),
                        jnp.asarray(params), s, ns)
    )[0, :, :, :, 0]
    # Compare only where all corners are interior (boundary semantics differ:
    # scipy feathers to cval, the reference hard-cuts).
    i, j, k = np.meshgrid(np.arange(ns), np.arange(ns), np.arange(ns), indexing="ij")
    pts = np.stack([k, j, i, np.ones_like(i)], 0).reshape(4, -1)
    src = (minv @ pts).reshape(3, ns, ns, ns)
    interior = np.all((np.floor(src) >= 1) & (np.floor(src) <= s - 3), axis=0)
    assert interior.sum() > 1000
    np.testing.assert_allclose(ours[interior], sp[interior], atol=1e-4)


def test_hard_zero_band(rng):
    """floor(x) == S-1 (or -1) must contribute exactly zero (clamp-cancel)."""
    s, ns = 8, 8
    vox = np.ones((1, s, s, s, 1), np.float32)
    # Destination = source (identity matrix), shifted by +6.5 in x: points with
    # x_src >= 7 must be zero, interior fractional points interpolate ones -> 1.
    matrix = np.tile(np.concatenate([np.eye(3), [[6.5], [0], [0]]], 1)[None], (1, 1, 1))
    out = np.asarray(
        affine_resample(jnp.asarray(vox), jnp.asarray(matrix, dtype=jnp.float32), (s, s, s))
    )[0, :, :, :, 0]
    assert np.all(out[:, :, 1:] == 0.0)  # x_src = k + 6.5 >= 7.5 -> dead band
    # x_src = 6.5 interpolates ones; rows/planes at integer boundary 7 on the
    # identity-mapped y/z axes are themselves in the dead band.
    np.testing.assert_allclose(out[:7, :7, 0], 1.0)
    assert np.all(out[7, :, 0] == 0.0) and np.all(out[:, 7, 0] == 0.0)


def test_multichannel(rng):
    s, ns = 8, 12
    vox = rng.random((1, s, s, s, 4)).astype(np.float32)
    params = np.array([[0.9, 0.2, 1.0]], np.float32)
    out = np.asarray(rotate_resample(jnp.asarray(vox), jnp.asarray(params), s, ns))
    assert out.shape == (1, ns, ns, ns, 4)
    for ch in range(4):
        oracle = np_rotate_resample(vox[0, :, :, :, ch], 0.9, 0.2, 1.0, s, ns)
        np.testing.assert_allclose(out[0, :, :, :, ch], oracle, atol=2e-4)


def test_grad_wrt_voxels_and_pose(rng):
    s, ns = 6, 8
    # Zero-pad the border: the reference semantics jump discontinuously to
    # zero at the grid's far boundary (clamp-cancel), so finite differences
    # are only meaningful when boundary voxels are zero.
    vox_np = np.zeros((1, s, s, s, 1), np.float32)
    vox_np[0, 1:-1, 1:-1, 1:-1, 0] = rng.random((s - 2, s - 2, s - 2))
    vox = jnp.asarray(vox_np)
    params = jnp.asarray(np.array([[0.8, 0.3, 1.0]], np.float32))

    def loss(v, p):
        out = rotate_resample(v, p, s, ns)
        return jnp.sum(out * out)

    gv, gp = jax.grad(loss, argnums=(0, 1))(vox, params)
    assert np.isfinite(np.asarray(gv)).all() and np.isfinite(np.asarray(gp)).all()
    assert np.abs(np.asarray(gp)).max() > 0

    # finite differences on pose
    eps = 1e-3
    for col in range(3):
        dp = np.zeros((1, 3), np.float32)
        dp[0, col] = eps
        f_plus = float(loss(vox, params + dp))
        f_minus = float(loss(vox, params - dp))
        fd = (f_plus - f_minus) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gp)[0, col], fd, rtol=2e-2, atol=1e-3)

    # finite differences on a few voxels
    v_np = np.asarray(vox)
    for idx in [(0, 2, 3, 1, 0), (0, 4, 4, 4, 0)]:
        dv = np.zeros_like(v_np)
        dv[idx] = eps
        fd = (float(loss(jnp.asarray(v_np + dv), params))
              - float(loss(jnp.asarray(v_np - dv), params))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gv)[idx], fd, rtol=2e-2, atol=1e-3)


def test_axis_transform_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 4, 5, 6, 3)).astype(np.float32))
    y = voxel_to_image_axes(x)
    assert y.shape == (2, 5, 4, 6, 3)
    np.testing.assert_array_equal(np.asarray(image_to_voxel_axes(y)), np.asarray(x))
    # spot-check the transpose+flip semantics
    np.testing.assert_array_equal(
        np.asarray(y)[0, 0, 1], np.asarray(x)[0, 1, 4]
    )


def test_silhouette(rng):
    v = rng.random((1, 4, 4, 4, 1)).astype(np.float32)
    s = np.asarray(silhouette(jnp.asarray(v)))
    np.testing.assert_allclose(s, v.max(axis=3))


def test_pose_matrix_against_oracle():
    params = np.array([[0.4, 1.2, 0.7]], np.float32)
    ours = np.asarray(pose_matrix(jnp.asarray(params)))[0]
    oracle = np_pose_matrix(0.4, 1.2, 0.7)
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_grid_to_grid_matrix_is_inverse():
    params = np.array([[0.4, 1.2, 0.7], [3.0, -0.8, 1.3]], np.float32)
    ours = np.asarray(grid_to_grid_matrix(jnp.asarray(params), 64, 128))
    for b in range(2):
        oracle = np_total_inverse(params[b, 0], params[b, 1], params[b, 2], 64, 128)
        np.testing.assert_allclose(ours[b], oracle[:3, :], atol=1e-5)


def test_camera_alignment_shape():
    vox = jnp.zeros((1, 8, 8, 8, 1))
    params = jnp.asarray(np.array([[0.1, 0.1, 1.0]], np.float32))
    out = rotate_resample_to_camera(vox, params, 8, 16)
    assert out.shape == (1, 16, 16, 16, 1)


def test_camera_patch_matches_full_resample_crop(rng):
    """Crop-fused resample must be bit-identical to resample-then-crop."""
    import jax

    from rendernet_tpu.ops.resample import (
        rotate_resample_camera_patch,
        rotate_resample_to_camera,
    )

    vox = jnp.asarray(rng.random((2, 16, 16, 16, 1), dtype=np.float32))
    pose = jnp.asarray([[0.7, 0.3, 1.1], [2.5, -0.4, 0.9]], jnp.float32)
    full = rotate_resample_to_camera(vox, pose, new_size=32)
    offsets = jnp.asarray([5, 11], jnp.int32)
    patch = rotate_resample_camera_patch(vox, pose, offsets, 8, new_size=32)
    np.testing.assert_array_equal(
        np.asarray(patch), np.asarray(full[:, 5:13, 11:19])
    )
    # and under jit with traced offsets
    patch2 = jax.jit(
        lambda v, p, o: rotate_resample_camera_patch(v, p, o, 8, new_size=32)
    )(vox, pose, offsets)
    np.testing.assert_allclose(np.asarray(patch2), np.asarray(patch), atol=1e-5)
