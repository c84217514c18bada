"""Synthetic dataset generation (no external data needed).

The reference's training data (ShapeNet renders / Basel faces) is not
shipped; these helpers fabricate structurally-identical datasets from any
``.binvox`` assets using the framework's own differentiable renderer as the
ground-truth image source (silhouette max-projection — the classical
"contour" target of README.md's contour model). This powers unit tests,
smoke training runs, and benchmarks end-to-end.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from rendernet_tpu.data.pose import pose_from_name, pose_to_name_suffix
from rendernet_tpu.io import binvox as binvox_rw
from rendernet_tpu.utils.image import encode_png, to_uint8

__all__ = ["make_synthetic_shader_tar", "synthetic_face_dataset", "beta_to_rgb"]


_SIL_FN = {}


def _render_silhouette(vox: np.ndarray, pose: np.ndarray, img_res: int) -> np.ndarray:
    """Render a [0,255] greyscale silhouette target with the framework ops."""
    import jax
    import jax.numpy as jnp

    from rendernet_tpu.ops.resample import rotate_resample_to_camera
    from rendernet_tpu.ops.transforms import silhouette

    # jit (cached per process): eager dispatch is pathological on remote
    # backends and needlessly slow everywhere else. Dataset generation is
    # host-side data prep, so it is pinned to the CPU backend: batch-1
    # exact-path renders gain nothing from an accelerator, the output is
    # bit-deterministic across runs, and on tunneled TPU platforms the
    # remote compile of the gather program can take longer than rendering
    # the whole dataset locally.
    if "f" not in _SIL_FN:
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:  # platform-restricted build: use the default
            cpu = None
        fn = jax.jit(
            lambda v, p: silhouette(
                rotate_resample_to_camera(v, p, new_size=128)
            )
        )
        _SIL_FN["f"] = fn
        _SIL_FN["cpu"] = cpu
    cpu = _SIL_FN["cpu"]
    import contextlib

    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        cam_sil = _SIL_FN["f"](
            jnp.asarray(vox[None, :, :, :, None], jnp.float32),
            jnp.asarray(pose[None], jnp.float32),
        )
    sil = np.asarray(cam_sil)[0, :, :, 0]
    # Nearest-neighbour upsample 128 -> img_res.
    factor = img_res // sil.shape[0]
    if factor > 1:
        sil = np.repeat(np.repeat(sil, factor, axis=0), factor, axis=1)
    return np.clip(sil, 0.0, 1.0) * 255.0


def _render_sil_normal(
    vox: np.ndarray, pose: np.ndarray, img_res: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Silhouette in [0,1] plus a pose-dependent screen-space normal map.

    The normal target is derived from the camera-aligned grid's depth
    front: d(h,w) = first occupied slice, normals from the depth gradient
    (encoded (n+1)/2, background = flat +Z = (0.5, 0.5, 1)). This gives the
    face workload's normal head real pose-varying structure to learn,
    standing in for the reference's Basel-face normal renders
    (tools/data_util.py:182-187)."""
    import jax
    import jax.numpy as jnp

    from rendernet_tpu.ops.resample import rotate_resample_to_camera

    if "cam" not in _SIL_FN:
        _SIL_FN["cam"] = jax.jit(
            lambda v, p: rotate_resample_to_camera(v, p, new_size=128)
        )
    import contextlib

    if "cpu" not in _SIL_FN:
        try:
            _SIL_FN["cpu"] = jax.devices("cpu")[0]
        except RuntimeError:
            _SIL_FN["cpu"] = None
    cpu = _SIL_FN["cpu"]
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        cam = _SIL_FN["cam"](
            jnp.asarray(vox[None, :, :, :, None], jnp.float32),
            jnp.asarray(pose[None], jnp.float32),
        )
    occ = np.asarray(cam)[0, :, :, :, 0] > 0.5  # [H, W, D]
    sil = occ.any(axis=2).astype(np.float32)
    depth = np.where(sil > 0, np.argmax(occ, axis=2), occ.shape[2]).astype(
        np.float32
    )
    dy, dx = np.gradient(depth)
    n = np.stack([-dx, -dy, np.ones_like(dx) * 2.0], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    normal = (n + 1.0) * 0.5
    normal[sil == 0] = (0.5, 0.5, 1.0)
    factor = img_res // sil.shape[0]
    if factor > 1:
        sil = np.repeat(np.repeat(sil, factor, axis=0), factor, axis=1)
        normal = np.repeat(np.repeat(normal, factor, axis=0), factor, axis=1)
    return sil, normal


def beta_to_rgb(beta: np.ndarray) -> np.ndarray:
    """Deterministic identity color from the first 3 texture-code dims:
    rgb = 0.3 + 0.65 * sigmoid(beta[:3]). The albedo head can only get
    this right by actually decoding the texture code."""
    b3 = np.asarray(beta).reshape(-1)[:3]
    return (0.3 + 0.65 / (1.0 + np.exp(-b3))).astype(np.float32)


def make_synthetic_shader_tar(
    out_dir: str,
    binvox_paths: Sequence[str],
    poses_deg: Sequence[Tuple[float, float]] = ((30, 60), (120, 75), (250, 100)),
    img_res: int = 512,
    radius: float = 3.3,
) -> Tuple[str, str]:
    """Build (images.tar, model_dir) shaped like the reference training data.

    Each binvox asset is written to ``model_dir`` as
    ``model_normalized_{i}_clean.binvox`` and rendered from each pose into a
    PNG tar entry named ``model_normalized_{i}_clean_p{az}_t{th}_r3.3.png``
    — exactly the pairing convention ``data_loader`` expects.
    """
    import io
    import tarfile

    os.makedirs(out_dir, exist_ok=True)
    model_dir = os.path.join(out_dir, "models")
    os.makedirs(model_dir, exist_ok=True)
    tar_path = os.path.join(out_dir, "images.tar")

    with tarfile.open(tar_path, "w") as tf:
        for i, bv_path in enumerate(binvox_paths):
            with open(bv_path, "rb") as f:
                vox = binvox_rw.read_as_3d_array(f).data.astype(np.float32)
            model_name = f"model_normalized_{i}_clean"
            binvox_rw.save_binvox(
                vox > 0.5, os.path.join(model_dir, model_name + ".binvox")
            )
            for az, th in poses_deg:
                entry = model_name + pose_to_name_suffix(az, th, radius)
                pose = pose_from_name(entry)
                img = _render_silhouette(vox, pose, img_res)
                png = encode_png(to_uint8(img))
                info = tarfile.TarInfo(entry + ".png")
                info.size = len(png)
                tf.addfile(info, io.BytesIO(png))
    return tar_path, model_dir


def synthetic_face_dataset(
    out_dir: str,
    binvox_paths: Sequence[str],
    poses_deg: Sequence[Tuple[float, float]] = ((30, 60), (250, 100)),
    img_res: int = 512,
    texture_dim: int = 199,
    seed: int = 0,
) -> Tuple[str, str, str, str]:
    """Build (images.tar, model_dir, texture_dir, normal_dir) shaped like the
    face workload's data: per-identity ``ply{id}.binvox`` + ``beta{id}.mat``,
    per-view image tar entry + normal-map PNG."""
    import io
    import tarfile

    import scipy.io

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    model_dir = os.path.join(out_dir, "models")
    texture_dir = os.path.join(out_dir, "textures")
    normal_dir = os.path.join(out_dir, "normals")
    for d in (model_dir, texture_dir, normal_dir):
        os.makedirs(d, exist_ok=True)
    tar_path = os.path.join(out_dir, "images.tar")

    with tarfile.open(tar_path, "w") as tf:
        for i, bv_path in enumerate(binvox_paths):
            ident = f"ply{80000 + i}"
            with open(bv_path, "rb") as f:
                vox = binvox_rw.read_as_3d_array(f).data.astype(np.float32)
            binvox_rw.save_binvox(
                vox > 0.5, os.path.join(model_dir, ident + ".binvox")
            )
            beta = rng.standard_normal((texture_dim, 1)).astype(np.float32)
            scipy.io.savemat(
                os.path.join(texture_dir, f"beta{ident.split('ly')[1]}.mat"),
                {"beta": beta},
            )
            rgb = beta_to_rgb(beta)  # identity color is a FUNCTION of beta
            for az, th in poses_deg:
                entry = ident + pose_to_name_suffix(az, th)
                pose = pose_from_name(entry)
                sil, normal = _render_sil_normal(vox, pose, img_res)
                albedo = sil[..., None] * rgb[None, None, :] * 255.0
                png = encode_png(to_uint8(albedo))
                info = tarfile.TarInfo(entry + ".png")
                info.size = len(png)
                tf.addfile(info, io.BytesIO(png))
                with open(os.path.join(normal_dir, entry + ".png"), "wb") as f:
                    f.write(encode_png(to_uint8(normal * 255.0)))
    return tar_path, model_dir, texture_dir, normal_dir
