"""CLI smoke tests (run in-process on CPU; no TPU required)."""
import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from rendernet_tpu.cli import convert, demo, pack_tar
from rendernet_tpu.cli.__main__ import COMMANDS, main as dispatch

ASSETS = "/root/reference/binvox"


def test_dispatcher_help_and_unknown():
    assert dispatch([]) == 0
    assert dispatch(["no-such-command"]) == 2
    assert set(COMMANDS) == {
        "render", "train-shader", "train-texture", "reconstruct",
        "pack-tar", "convert",
    }


def test_pack_tar_roundtrip(tmp_path):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    from rendernet_tpu.utils.image import save_image

    for i in range(3):
        save_image(np.full((8, 8), i * 80, np.uint8), str(imgs / f"im_{i}.png"))
    out = str(tmp_path / "out.tar")
    pack_tar.main(["--images_path", str(imgs), "--save_path", out])
    import tarfile

    with tarfile.open(out) as tf:
        assert len(tf.getnames()) == 3


def test_demo_render_greyscale(tmp_path):
    out = str(tmp_path / "render")
    demo.main([
        "--voxel_path", os.path.join(ASSETS, "chair.binvox"),
        "--render_dir", out, "--out_channels", "1",
        "--azimuth", "60", "--elevation", "20",
    ])
    files = os.listdir(out)
    assert len(files) == 1 and files[0].endswith(".png")


def test_convert_npz_refdir_roundtrip(tmp_path):
    import jax

    from rendernet_tpu.models.shader import ShaderConfig, init_shader_params
    from rendernet_tpu.train.checkpoint import load_params_npz, save_params_npz

    # Use a small-depth template indirectly: full shader init is heavy, so
    # exercise the converter on the shape decoder instead.
    from rendernet_tpu.models.decoders import init_shape_decoder_params

    params = init_shape_decoder_params(jax.random.PRNGKey(0), z_dim=8)
    src = str(tmp_path / "params.npz")
    save_params_npz(src, params)
    refdir = str(tmp_path / "refdir")
    convert.main(["npz-to-refdir", src, refdir])
    assert "g_zP_g_gc1_weights.txt.npz" in os.listdir(refdir)


def test_demo_rotate_gif(tmp_path):
    out = str(tmp_path / "render")
    gif = str(tmp_path / "sweep.gif")
    # monkeypatch the sweep to 3 frames for speed
    import numpy as np

    orig = np.arange
    demo_args = [
        "--voxel_path", os.path.join(ASSETS, "chair.binvox"),
        "--render_dir", out, "--out_channels", "1",
        "--rotate", "--gif", gif,
    ]
    import unittest.mock as mock

    with mock.patch.object(np, "arange", lambda *a, **k: orig(0.0, 30.0, 10.0)
                           if len(a) == 3 and a[1] == 360.0 else orig(*a, **k)):
        demo.main(demo_args)
    assert os.path.exists(gif)
    assert len([f for f in os.listdir(out) if f.endswith(".png")]) == 3


def test_compilation_cache_populates(tmp_path, monkeypatch):
    """The CLI's persistent compile cache writes executables to disk and
    can be disabled by env var."""
    import jax

    from rendernet_tpu.utils.compile_cache import enable_compilation_cache

    cache = str(tmp_path / "xla_cache")
    monkeypatch.setenv("RENDERNET_TPU_COMPILE_CACHE", cache)
    monkeypatch.setenv("RENDERNET_TPU_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache() is None  # opt-out honored
    monkeypatch.delenv("RENDERNET_TPU_NO_COMPILE_CACHE")
    assert enable_compilation_cache() == cache
    try:
        import jax.numpy as jnp
        import numpy as np

        # A compile above the min-time threshold is not guaranteed on CPU,
        # so force-cache everything for the assertion.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        x = jnp.asarray(np.ones((64, 64), np.float32))
        float(jax.jit(lambda a: (a @ a).sum() * 3.14159)(x))
        assert os.listdir(cache)  # an executable landed in the cache
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_reconstruct_cli_smoke(tmp_path):
    """Full workload-3 CLI on the reference's shipped target assets
    (random frozen nets, tiny grid/budget): shaded-target synthesis,
    coarse-to-fine optimization, per-epoch image+binvox dumps."""
    import json

    from rendernet_tpu.cli import reconstruct

    out = str(tmp_path / "recon_run")
    cfg = {
        "target_albedo": "/root/reference/data/ply80055_p303_t108_r3.3_albedo.png",
        "target_normal": "/root/reference/data/ply80055_p303_t108_r3.3_normal.png",
        "target_azimuth_light": 294,
        "target_elevation_light": 105,
        "batch_size": 2,
        "z_dim": 8,
        "inner_step": 2,
        "max_epochs": 1,
        "new_size": 16,
        "img_res": 64,
        "threshold": 0.1,
        "shape_eta": 0.1,
        "pose_eta": 0.001,
        "tex_eta": 0.1,
        "light_eta": 0.05,
        "sample_save": out,
    }
    cfg_path = str(tmp_path / "recon.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    reconstruct.main([cfg_path, "--random-weights"])
    files = os.listdir(out)
    assert "shaded_target.png" in files
    assert any(f.startswith("epoch0") and f.endswith(".png") for f in files)
    assert any(f.endswith(".binvox") for f in files)
    assert "loss_history.npz" in files


def test_train_shader_cli_smoke(tmp_path):
    """train-shader CLI end to end: config JSON -> synthetic tar ->
    2 jitted steps over the device mesh -> checkpoint + metrics in the
    run dir (RenderNet_Shader.py invocation parity)."""
    import json

    from rendernet_tpu.cli import train_shader
    from rendernet_tpu.data import make_synthetic_shader_tar

    tar, mdir = make_synthetic_shader_tar(
        str(tmp_path / "data"), [os.path.join(ASSETS, "chair.binvox")] * 2,
        poses_deg=((30, 60), (120, 75)), img_res=128,
    )
    out = str(tmp_path / "run")
    cfg = {
        "image_path": tar, "model_path": mdir, "batch_size": 2,
        "img_res": 128, "new_size": 32, "e_eta": 1e-4,
        "compute_dtype": "float32", "max_epochs": 1, "is_greyscale": 1,
        "sample_save": out,
    }
    cfg_path = str(tmp_path / "train.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    train_shader.main([cfg_path, "--max-steps", "2"])
    files = os.listdir(out)
    assert "config.json" in files
    from rendernet_tpu.train.config import TrainConfig as _TC

    ckpt_name = _TC().trained_model_name
    assert ckpt_name in files, files  # checkpoint written at max_steps exit


def test_train_texture_cli_smoke(tmp_path):
    """train-texture CLI end to end on a synthetic face dataset
    (RenderNet_Texture_Face_Normal.py invocation parity)."""
    import json

    from rendernet_tpu.cli import train_texture
    from rendernet_tpu.data import synthetic_face_dataset

    tar, mdir, tdir, ndir = synthetic_face_dataset(
        str(tmp_path / "face"), [os.path.join(ASSETS, "chair.binvox")],
        poses_deg=((30, 60),), img_res=128,
    )
    out = str(tmp_path / "run")
    cfg = {
        "image_path": tar, "model_path": mdir, "texture_path": tdir,
        "normal_path": ndir, "batch_size": 1, "img_res": 128,
        "new_size": 32, "e_eta": 1e-4, "compute_dtype": "float32",
        "max_epochs": 1, "is_greyscale": 0, "sample_save": out,
        "resample": "exact",
    }
    cfg_path = str(tmp_path / "tex.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    train_texture.main([cfg_path, "--max-steps", "1"])
    assert "config.json" in os.listdir(out)


@pytest.mark.slow
def test_train_texture_cli_on_reference_data_formats(tmp_path):
    """End-to-end smoke over the ACTUAL reference face-data formats
    (VERDICT r3 #5): the real `/root/reference/data` PNGs — filenames like
    ``ply80024_p294_t105_r3.3_albedo.png`` (tools/data_util.py:111-118
    pose grammar, :182-187 beta/normal pairing) — packed into a training
    tar with the pack-tar CLI, per-identity Basel ``beta{id}.mat`` files,
    and ``ply{id}.binvox`` voxel models, driven through 2 jitted
    train-texture steps. Image CONTENT is downscaled to keep the smoke
    fast on CPU; names and formats are the reference's own."""
    import io as _io
    import json

    import scipy.io
    from PIL import Image

    from rendernet_tpu.cli import pack_tar, train_texture

    res = 128  # content downscale (512 -> 128); filenames stay untouched
    ref_pngs = sorted(glob.glob("/root/reference/data/*_albedo.png"))
    assert len(ref_pngs) == 2
    img_dir = tmp_path / "images"
    normal_dir = tmp_path / "normals"
    tex_dir = tmp_path / "textures"
    model_dir = tmp_path / "models"
    for d in (img_dir, normal_dir, tex_dir, model_dir):
        d.mkdir()

    rng = np.random.default_rng(0)
    for albedo_path in ref_pngs:
        name = os.path.basename(albedo_path)  # ply80024_p294_t105_r3.3_albedo.png
        entry = name[:-len(".png")]
        ident = entry.split("_")[0]
        alb = np.asarray(Image.open(albedo_path))[::4, ::4][:res, :res]
        Image.fromarray(alb).save(str(img_dir / name))
        nrm = np.asarray(
            Image.open(albedo_path.replace("_albedo", "_normal"))
        )[::4, ::4][:res, :res]
        # the loader reads the normal map keyed by the tar ENTRY name
        Image.fromarray(nrm).save(str(normal_dir / (entry + ".png")))
        scipy.io.savemat(
            str(tex_dir / f"beta{ident[3:]}.mat"),
            {"beta": rng.standard_normal((199, 1)).astype(np.float32)},
        )
        # a real 64^3 reference binvox under the identity's model name
        with open(os.path.join(ASSETS, "chair.binvox"), "rb") as f:
            (model_dir / f"{ident}.binvox").write_bytes(f.read())

    tar_path = str(tmp_path / "faces.tar")
    pack_tar.main(["--images_path", str(img_dir), "--save_path", tar_path])

    out = str(tmp_path / "run")
    cfg = {
        "image_path": tar_path, "model_path": str(model_dir),
        "texture_path": str(tex_dir), "normal_path": str(normal_dir),
        "batch_size": 2, "img_res": res, "new_size": res // 4,
        "e_eta": 1e-4, "compute_dtype": "float32", "max_epochs": 1,
        "is_greyscale": 0, "sample_save": out, "sample_every_steps": 1,
    }
    cfg_path = str(tmp_path / "texture.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    train_texture.main([cfg_path, "--max-steps", "2"])

    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    losses = [m["loss"] for m in metrics if "loss" in m]
    assert losses and all(np.isfinite(losses))
    # the pose grammar was actually parsed: p294 -> azimuth rad, t105 ->
    # elevation = 90-105 = -15 deg, r3.3 -> scale 1.0
    from rendernet_tpu.data import pose_from_name

    pose = pose_from_name("ply80024_p294_t105_r3.3_albedo")
    assert pose[0] == pytest.approx(np.deg2rad(294))
    assert pose[1] == pytest.approx(np.deg2rad(90 - 105))
    assert pose[2] == pytest.approx(3.3 / 3.3)
