"""Data pipeline tests: pose parsing, synthetic datasets, streaming loaders."""
import math
import os

import numpy as np
import pytest

from rendernet_tpu.data import (
    data_loader,
    data_loader_image_texture_normal_face,
    make_synthetic_shader_tar,
    model_loader,
    pose_from_name,
    pose_to_name_suffix,
    synthetic_face_dataset,
)

ASSETS = "/root/reference/binvox"


def test_pose_from_name_reference_semantics():
    p = pose_from_name("model_normalized_3_clean_p303_t108_r3.3")
    assert p[0] == pytest.approx(303 * math.pi / 180.0)
    assert p[1] == pytest.approx((90 - 108) * math.pi / 180.0)
    assert p[2] == pytest.approx(1.0)


def test_pose_name_roundtrip():
    suffix = pose_to_name_suffix(245, 72, 3.3)
    p = pose_from_name("x" + suffix)
    assert p[0] == pytest.approx(245 * math.pi / 180.0)
    assert p[1] == pytest.approx(18 * math.pi / 180.0)


@pytest.fixture(scope="module")
def shader_dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    chairs = [os.path.join(ASSETS, "chair.binvox")] * 2
    return make_synthetic_shader_tar(
        str(out), chairs, poses_deg=((30, 60), (250, 100)), img_res=256
    )


def test_data_loader_shapes_and_pairing(shader_dataset):
    tar_path, model_dir = shader_dataset
    chunks = list(
        data_loader(
            tar_path, model_dir, batch_size=2, batches_chunk=1,
            flatten=True, img_res=256,
        )
    )
    assert len(chunks) == 2  # 2 models x 2 poses / chunk of 2
    ims, mods, params, names = chunks[0]
    assert ims.shape == (2, 256, 256, 1)
    assert mods.shape == (2, 64, 64, 64, 1)
    assert params.shape == (2, 3)
    assert ims.max() > 1.5  # [0,255] contract: caller divides
    assert mods.max() == 1.0  # binvox occupancy paired by name
    assert all("_p" in n for n in names)


def test_data_loader_tail_padding(shader_dataset):
    tar_path, model_dir = shader_dataset
    # 4 samples with batch 3 -> one full chunk + one padded tail of 3.
    chunks = list(
        data_loader(tar_path, model_dir, batch_size=3, flatten=True, img_res=256)
    )
    assert [c[0].shape[0] for c in chunks] == [3, 3]


def test_model_loader_streams_binvox(tmp_path):
    import tarfile

    tar = str(tmp_path / "models.tar")
    with tarfile.open(tar, "w") as tf:
        tf.add(os.path.join(ASSETS, "chair.binvox"), arcname="model_a_0_x.binvox")
        tf.add(os.path.join(ASSETS, "table.binvox"), arcname="model_b_1_x.binvox")
    chunks = list(model_loader(tar, batch_size=2))
    assert len(chunks) == 1
    mods, names = chunks[0]
    assert mods.shape == (2, 64, 64, 64, 1)
    assert names == ["model_a_0_clean", "model_b_1_clean"]


def test_face_loader(tmp_path):
    tar, model_dir, tex_dir, nrm_dir = synthetic_face_dataset(
        str(tmp_path), [os.path.join(ASSETS, "chair.binvox")],
        poses_deg=((30, 60),), img_res=128,
    )
    chunks = list(
        data_loader_image_texture_normal_face(
            tar, model_dir, tex_dir, nrm_dir, batch_size=1, img_res=128
        )
    )
    assert len(chunks) == 1
    ims, normals, mods, texs, params, names = chunks[0]
    assert ims.shape == (1, 128, 128, 3)
    assert normals.shape == (1, 128, 128, 3)
    assert texs.shape == (1, 199)
    assert mods.max() == 1.0
