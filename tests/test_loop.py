"""End-to-end epoch-driver tests on synthetic data (CPU, tiny shapes)."""
import json
import os

import numpy as np
import pytest

from rendernet_tpu.data import make_synthetic_shader_tar, synthetic_face_dataset
from rendernet_tpu.models.shader import ShaderConfig
from rendernet_tpu.models.texture_face import TextureFaceConfig
from rendernet_tpu.train.config import TrainConfig
from rendernet_tpu.train.loop import train_shader, train_texture

pytestmark = pytest.mark.slow

ASSETS = "/root/reference/binvox"


@pytest.fixture(scope="module")
def shader_data(tmp_path_factory):
    out = tmp_path_factory.mktemp("loopdata")
    return make_synthetic_shader_tar(
        str(out), [os.path.join(ASSETS, "chair.binvox")] * 2,
        poses_deg=((30, 60), (120, 75)), img_res=128,
    )


def _cfg(shader_data, tmp_path, **kw):
    tar, mdir = shader_data
    base = dict(
        image_path=tar, model_path=mdir, batch_size=2, img_res=128,
        new_size=32, e_eta=1e-4, compute_dtype="float32", max_epochs=1,
        sample_save=str(tmp_path / "run"), sample_every_steps=2,
        resample="exact",
    )
    base.update(kw)
    return TrainConfig(**base)


def test_shader_loop_end_to_end(shader_data, tmp_path):
    cfg = _cfg(shader_data, tmp_path)
    state = train_shader(cfg, ShaderConfig(new_size=32), max_steps=2)
    assert int(state.step) == 2
    run = tmp_path / "run"
    assert (run / "config.json").exists()
    assert (run / "metrics.jsonl").exists()
    metrics = [json.loads(l) for l in open(run / "metrics.jsonl")]
    assert any("loss" in m for m in metrics)
    # sample dumps fired at step 2
    assert any(p.name.endswith("_pred.png") for p in run.iterdir())


def test_shader_loop_resumes_from_checkpoint(shader_data, tmp_path):
    cfg = _cfg(shader_data, tmp_path)
    mcfg = ShaderConfig(new_size=32)
    s1 = train_shader(cfg, mcfg, max_steps=2)
    s2 = train_shader(cfg, mcfg, max_steps=4)
    assert int(s1.step) == 2 and int(s2.step) == 4
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(m.get("resumed_at_step") == 2 for m in metrics)


def test_texture_loop_end_to_end(tmp_path):
    tar, mdir, tdir, ndir = synthetic_face_dataset(
        str(tmp_path / "face"), [os.path.join(ASSETS, "chair.binvox")],
        poses_deg=((30, 60),), img_res=128,
    )
    cfg = TrainConfig(
        image_path=tar, model_path=mdir, texture_path=tdir, normal_path=ndir,
        batch_size=1, img_res=128, new_size=32, e_eta=1e-4,
        compute_dtype="float32", is_greyscale=False, max_epochs=1,
        sample_save=str(tmp_path / "trun"), sample_every_steps=1,
        resample="exact",
    )
    state = train_texture(cfg, TextureFaceConfig(new_size=32), max_steps=1)
    assert int(state.step) == 1
    assert (tmp_path / "trun" / "metrics.jsonl").exists()


def test_dead_training_warning_fires_on_frozen_params(shader_data, tmp_path):
    """Failure detection for the all-finite death mode (round-5
    postmortem, docs/performance.md): when parameters stop changing
    between logging points — here forced with e_eta=0, in the wild via
    bf16 sigmoid saturation zeroing every gradient — the loop emits a
    dead_training_warning event. A live run (normal lr) must not."""
    cfg = _cfg(shader_data, tmp_path, e_eta=0.0, sample_every_steps=1,
               max_epochs=4)
    train_shader(cfg, ShaderConfig(new_size=32), max_steps=4)
    metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(m.get("event") == "dead_training_warning" for m in metrics)

    cfg2 = _cfg(shader_data, tmp_path, e_eta=1e-4, sample_every_steps=1,
                max_epochs=4, sample_save=str(tmp_path / "run2"))
    train_shader(cfg2, ShaderConfig(new_size=32), max_steps=4)
    metrics2 = [json.loads(l)
                for l in open(tmp_path / "run2" / "metrics.jsonl")]
    assert not any(m.get("event") == "dead_training_warning" for m in metrics2)
