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

__all__ = ["make_synthetic_shader_tar", "synthetic_face_dataset"]


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
            scipy.io.savemat(
                os.path.join(texture_dir, f"beta{ident.split('ly')[1]}.mat"),
                {"beta": rng.standard_normal((texture_dim, 1)).astype(np.float32)},
            )
            for az, th in poses_deg:
                entry = ident + pose_to_name_suffix(az, th)
                pose = pose_from_name(entry)
                sil = _render_silhouette(vox, pose, img_res) / 255.0
                albedo = np.stack([sil, sil * 0.8, sil * 0.6], axis=-1) * 255.0
                png = encode_png(to_uint8(albedo))
                info = tarfile.TarInfo(entry + ".png")
                info.size = len(png)
                tf.addfile(info, io.BytesIO(png))
                # Synthetic normal map: flat +Z normals inside the silhouette.
                normal = np.stack(
                    [0.5 * sil, 0.5 * sil, 0.5 * sil + 0.5 * (sil > 0)], axis=-1
                )
                with open(os.path.join(normal_dir, entry + ".png"), "wb") as f:
                    f.write(encode_png(to_uint8(normal * 255.0)))
    return tar_path, model_dir, texture_dir, normal_dir
