"""npz weight-dictionary import/export round-trips."""
import os

import jax
import numpy as np

from rendernet_tpu.compat import (
    export_reference_weight_dir,
    load_reference_weight_dir,
    npz_key_for_path,
    params_from_weight_dict,
    weight_dict_from_params,
)
from rendernet_tpu.models.decoders import init_recon_rendernet_params
from rendernet_tpu.models.shader import ShaderConfig, init_shader_params


def test_npz_key_translation():
    assert npz_key_for_path("encoder/e_conv1/e_conv1/weights") == "e_conv1_e_conv1_weights"
    assert npz_key_for_path("encoder/e_conv1/alpha") == "e_conv1_alpha"
    assert npz_key_for_path("encoder/res1_skip/con1_3X3/weights") == "res1_skip_con1_3X3_weights"
    assert npz_key_for_path("encoder/Image/e_conv6_1/e_conv6_1/biases") == "Image_e_conv6_1_e_conv6_1_biases"
    assert npz_key_for_path("g_zP/g_gc1/weights") == "g_zP_g_gc1_weights"
    assert npz_key_for_path("g_conv5/weights") == "g_conv5_weights"
    assert npz_key_for_path("texture_encoder/e_tex_dc1/g_gc1/weights") == "e_tex_dc1_g_gc1_weights"


def test_recon_rendernet_keys_match_reference_consumers():
    """Every key the reconstruction script reads must be produced by our
    param paths (Reconstruct_RenderNet_Face.py:126-299)."""
    params = init_recon_rendernet_params(jax.random.PRNGKey(0), new_size=32)
    keys = {npz_key_for_path(p) for p in params}
    for expected in [
        "e_conv1_e_conv1_weights", "e_conv1_e_conv1_biases", "e_conv1_alpha",
        "e_conv2_alpha", "e_conv3_e_conv3_weights",
        "res1_1_con1_3X3_weights", "res1_10_conv2_3x3_biases",
        "res1_skip_con1_3X3_weights", "e_conv4_e_conv4_weights", "e_conv4_alpha",
        "res2_5_con1_3X3_weights", "res2_skip_con1_3X3_biases",
        "e_conv5_e_conv5_weights", "e_conv5_alpha",
        "res3_3_conv2_3x3_weights", "res3_skip_con1_3X3_weights",
        "Image_e_conv6_1_e_conv6_1_weights", "Image_e_conv6_1_alpha",
        "Image_e_conv7_1_e_conv7_1_weights", "Image_e_conv8_1_alpha",
        "Image_e_conv9_1_e_conv9_1_weights",
        "Image_e_conv11_1_e_conv11_1_weights",
        "Normal_e_conv6_2_e_conv6_2_weights", "Normal_e_conv7_2_alpha",
        "Normal_e_conv9_2_e_conv9_2_biases",
        "Normal_e_conv11_e_conv11_2_weights",
    ]:
        assert expected in keys, expected


def test_weight_dict_roundtrip(tmp_path):
    cfg = ShaderConfig(new_size=32)
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    wd = weight_dict_from_params(params)
    assert len(wd) == len(params)  # translation is bijective
    restored = params_from_weight_dict(params, wd, strict=True)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]), restored[k])


def test_reference_weight_dir_roundtrip(tmp_path):
    cfg = ShaderConfig(new_size=32)
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path / "weights")
    export_reference_weight_dir(params, out)
    files = os.listdir(out)
    assert "e_conv1_e_conv1_weights.txt.npz" in files
    wd = load_reference_weight_dir(out)
    restored = params_from_weight_dict(params, wd, strict=True)
    k = "encoder/res2_skip/con1_3X3/weights"
    np.testing.assert_array_equal(np.asarray(params[k]), restored[k])


def test_partial_load_non_strict():
    cfg = ShaderConfig(new_size=32)
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    partial = {"e_conv1_e_conv1_weights": np.zeros((5, 5, 5, 1, 8), np.float32)}
    out = params_from_weight_dict(params, partial, strict=False)
    assert np.all(np.asarray(out["encoder/e_conv1/e_conv1/weights"]) == 0)
    np.testing.assert_array_equal(
        np.asarray(out["encoder/e_conv2/e_conv2/weights"]),
        np.asarray(params["encoder/e_conv2/e_conv2/weights"]),
    )
