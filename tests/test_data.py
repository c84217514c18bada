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


# ---------------------------------------------------------------------------
# background prefetch (data/prefetch.py)
# ---------------------------------------------------------------------------
def test_prefetch_preserves_order_and_content():
    from rendernet_tpu.data.prefetch import prefetch

    items = [np.full((4, 4), i) for i in range(17)]
    out = list(prefetch(iter(items), depth=3))
    assert len(out) == 17
    for i, a in enumerate(out):
        np.testing.assert_array_equal(a, items[i])


def test_prefetch_depth_zero_is_synchronous():
    from rendernet_tpu.data.prefetch import prefetch

    it = iter([1, 2, 3])
    assert prefetch(it, depth=0) is it


def test_prefetch_propagates_producer_exception():
    from rendernet_tpu.data.prefetch import prefetch

    def gen():
        yield 1
        yield 2
        raise ValueError("decode failed")

    p = prefetch(gen(), depth=2)
    assert next(p) == 1
    assert next(p) == 2
    with pytest.raises(ValueError, match="decode failed"):
        next(p)


def test_prefetch_early_break_stops_producer():
    import threading
    import time

    from rendernet_tpu.data.prefetch import prefetch

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    p = prefetch(gen(), depth=2)
    for item in p:
        if item == 3:
            break
    p.close()
    time.sleep(0.3)  # let the producer notice the close
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n  # no further production after close
    assert n < 1000
    assert threading.active_count() < 20  # no thread leak across tests


def test_prefetch_wraps_real_data_loader(tmp_path):
    """prefetch(data_loader(...)) yields the same chunks as the plain
    loader on a real synthetic tar."""
    from rendernet_tpu.data.loaders import data_loader
    from rendernet_tpu.data.prefetch import prefetch
    from rendernet_tpu.data.synthetic import make_synthetic_shader_tar

    img_tar, model_dir = make_synthetic_shader_tar(
        str(tmp_path), [os.path.join(ASSETS, "chair.binvox")] * 2,
        poses_deg=((30, 60), (120, 75)), img_res=128,
    )
    kw = dict(batch_size=2, batches_chunk=1, img_res=128, flatten=True)
    plain = list(data_loader(img_tar, model_dir, **kw))
    fetched = list(prefetch(data_loader(img_tar, model_dir, **kw), depth=2))
    assert len(plain) == len(fetched)
    for (ia, va, pa, na), (ib, vb, pb, nb) in zip(plain, fetched):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(va, vb)
        np.testing.assert_array_equal(pa, pb)
        assert na == nb
