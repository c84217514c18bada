"""Model-zoo shape/parameter tests (small spatial sizes; full depth)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rendernet_tpu.models import (
    ShaderConfig,
    TextureFaceConfig,
    init_recon_rendernet_params,
    init_shader_params,
    init_shape_decoder_params,
    init_texture_face_params,
    recon_rendernet,
    shader_forward,
    shader_rendernet,
    shape_decoder_3d,
    texture_decoder,
    texture_face_forward,
)
from rendernet_tpu.nn.layers import Module

SMALL = ShaderConfig(new_size=32)  # 32-deep camera grid keeps tests fast


def test_shader_param_paths_match_tf_scopes():
    params = init_shader_params(jax.random.PRNGKey(0), SMALL)
    # Spot-check the TF-scope-compatible naming used for npz import.
    for path in [
        "encoder/e_conv1/e_conv1/weights",
        "encoder/e_conv1/e_conv1/biases",
        "encoder/e_conv1/alpha",
        "encoder/res1_1/con1_3X3/weights",
        "encoder/res1_10/conv2_3x3/biases",
        "encoder/res1_skip/con1_3X3/weights",
        "encoder/projection_unit/Conv/weights",
        "encoder/projection_unit/alpha",
        "encoder/res2_5/con1_3X3/weights",
        "encoder/res2_skip/con1_3X3/weights",
        "encoder/e_conv5/e_conv5/weights",
        "encoder/res3_3/conv2_3x3/weights",
        "encoder/e_conv7/e_conv7/weights",
        "encoder/e_conv11/weights",
    ]:
        assert path in params, path
    # e_conv1: 5x5x5 conv, 1 -> 8 channels.
    assert params["encoder/e_conv1/e_conv1/weights"].shape == (5, 5, 5, 1, 8)
    # projection unit at depth 32: D*C = (32/4) * 32 = 256.
    assert params["encoder/projection_unit/Conv/weights"].shape == (1, 1, 256, 256)
    # deconv kernels are TF-layout (h, w, out, in).
    assert params["encoder/e_conv7/e_conv7/weights"].shape == (4, 4, 128, 256)


def test_shader_output_shape_and_range():
    params = init_shader_params(jax.random.PRNGKey(0), SMALL)
    m = Module(params=params)
    vox = jnp.zeros((2, 16, 16, 32, 1), jnp.float32)
    out = shader_rendernet(m, vox, SMALL)
    assert out.shape == (2, 64, 64, 1)  # 4x spatial upsampling
    assert jnp.all(out >= 0) and jnp.all(out <= 1)


def test_shader_full_pipeline_from_object_voxels():
    params = init_shader_params(jax.random.PRNGKey(1), SMALL)
    vox = jnp.zeros((1, 16, 16, 16, 1), jnp.float32).at[:, 6:10, 6:10, 6:10].set(1.0)
    pose = jnp.array([[0.7, 0.2, 1.0]], jnp.float32)
    img = jax.jit(
        lambda p, v, q: shader_forward(p, v, q, SMALL)
    )(params, vox, pose)
    assert img.shape == (1, 128, 128, 1)
    assert np.isfinite(np.asarray(img)).all()


def test_shader_rgb_head():
    cfg = ShaderConfig(new_size=32, out_channels=3)
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    m = Module(params=params)
    out = shader_rendernet(m, jnp.zeros((1, 8, 8, 32, 1)), cfg)
    assert out.shape == (1, 32, 32, 3)


def test_shader_gradients_flow_to_pose_and_voxels():
    params = init_shader_params(jax.random.PRNGKey(0), SMALL)
    # Non-constant field: pose gradients flow through the trilinear weights,
    # which cancel on constant inputs.
    vox = (
        jnp.arange(16 * 16 * 16, dtype=jnp.float32).reshape(1, 16, 16, 16, 1) / 4096.0
    )
    pose = jnp.array([[0.3, 0.1, 1.0]], jnp.float32)

    def loss(v, q):
        return jnp.sum(shader_forward(params, v, q, SMALL) ** 2)

    gv, gq = jax.grad(loss, argnums=(0, 1))(vox, pose)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gq)).all()
    assert float(jnp.abs(gq).sum()) > 0.0  # pose gradient is live


def test_texture_face_two_heads():
    cfg = TextureFaceConfig(new_size=32)
    params = init_texture_face_params(jax.random.PRNGKey(0), cfg)
    assert "texture_encoder/e_tex_fc1/fully_connected/weights" in params
    assert "encoder/Image/e_conv6_1/e_conv6_1/weights" in params
    assert "encoder/Normal/e_conv10_2/e_conv10_2/weights" in params
    vox = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    beta = jnp.zeros((1, 199), jnp.float32)
    pose = jnp.array([[0.5, 0.1, 1.0]], jnp.float32)
    albedo, normal = texture_face_forward(params, vox, beta, pose, cfg)
    assert albedo.shape == (1, 128, 128, 3)
    assert normal.shape == (1, 128, 128, 3)


def test_texture_decoder_grid_shape():
    cfg = TextureFaceConfig()
    params = init_texture_face_params(jax.random.PRNGKey(0), cfg)
    m = Module(params=params)
    grid = texture_decoder(m, jnp.zeros((2, 199), jnp.float32))
    assert grid.shape == (2, 64, 64, 64, 4)


def test_shape_decoder_output():
    params = init_shape_decoder_params(jax.random.PRNGKey(0))
    assert "g_zP/g_gc1/weights" in params
    assert "g_conv5/weights" in params  # final layer not scope-doubled
    m = Module(params=params)
    vox = shape_decoder_3d(m, jnp.zeros((1, 200), jnp.float32))
    assert vox.shape == (1, 64, 64, 64, 1)
    assert jnp.all(vox >= 0) and jnp.all(vox <= 1)


def test_recon_rendernet_paths_and_shapes():
    params = init_recon_rendernet_params(jax.random.PRNGKey(0), new_size=32)
    assert "encoder/e_conv4/e_conv4/weights" in params  # raw-reshape projection
    assert "encoder/Image/e_conv11_1/e_conv11_1/weights" in params
    assert "encoder/Normal/e_conv11/e_conv11_2/weights" in params  # naming quirk
    # relu res blocks have no prelu alpha
    assert not any("res1_1/alpha" in k for k in params)
    m = Module(params=params)
    albedo, normal = recon_rendernet(m, jnp.zeros((1, 8, 8, 32, 5), jnp.float32))
    assert albedo.shape == (1, 32, 32, 3)
    assert normal.shape == (1, 32, 32, 3)


def test_dropout_active_only_in_train_mode():
    cfg = ShaderConfig(new_size=32, keep_prob=0.5)
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    vox = jnp.ones((1, 8, 8, 32, 1), jnp.float32)
    m_eval = Module(params=params)
    out_eval_1 = shader_rendernet(m_eval, vox, cfg)
    m_eval2 = Module(params=params)
    out_eval_2 = shader_rendernet(m_eval2, vox, cfg)
    np.testing.assert_array_equal(np.asarray(out_eval_1), np.asarray(out_eval_2))
    m_train = Module(params=params, train=True, dropout_rng=jax.random.PRNGKey(7))
    out_train = shader_rendernet(m_train, vox, cfg)
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval_1))


def test_remat_preserves_values_and_grads():
    cfg = ShaderConfig(new_size=32)
    cfg_r = ShaderConfig(new_size=32, remat=True)
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    vox = jnp.asarray(
        np.random.default_rng(3).random((1, 8, 8, 32, 1)).astype(np.float32)
    )

    def loss(p, c):
        m = Module(params=p)
        return jnp.sum(shader_rendernet(m, vox, c) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, cfg_r))(params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    k = "encoder/res2_5/con1_3X3/weights"
    np.testing.assert_allclose(
        np.asarray(g0[k]), np.asarray(g1[k]), rtol=2e-3, atol=1e-6
    )  # recompute changes XLA fusion order slightly


def test_shader_golden_regression():
    """Fixed-seed tiny pipeline output matches the committed golden file —
    catches semantic drift (layer order, init, padding, resample) that
    oracle-comparison tests can miss when both paths change together."""
    import os

    import numpy as np

    from rendernet_tpu.models.shader import (
        ShaderConfig,
        init_shader_params,
        shader_forward,
    )

    cfg = ShaderConfig(out_channels=1, enc_channels=(2, 2, 4), res1_blocks=1,
                       res2_blocks=1, res3_blocks=1, base=2, new_size=16)
    params = init_shader_params(jax.random.PRNGKey(42), cfg)
    rng = np.random.default_rng(42)
    vox = jnp.asarray((rng.random((1, 8, 8, 8, 1)) > 0.6).astype(np.float32))
    pose = jnp.asarray(np.array([[1.2, 0.4, 1.0]], np.float32))
    out = np.asarray(shader_forward(params, vox, pose, cfg))
    golden = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                  "shader_tiny_seed42.npy"))
    np.testing.assert_allclose(out, golden, atol=1e-5)


def test_remat_3d_matches_baseline():
    """ShaderConfig.remat_3d (checkpoint only the 3D res stack) is
    semantics-preserving: identical forward output and parameter
    gradients to the no-remat build."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.models.shader import (
        ShaderConfig,
        init_shader_params,
        shader_rendernet,
    )
    from rendernet_tpu.nn.layers import Module

    base = ShaderConfig(
        enc_channels=(4, 4, 4), res1_blocks=2, res2_blocks=1, res3_blocks=1,
        base=4, new_size=16,
    )
    params = init_shader_params(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 16, 16, 16, 1)).astype(np.float32))

    def loss(cfg):
        def f(p):
            m = Module(params=p)
            return jnp.sum(shader_rendernet(m, x, cfg) ** 2)

        return f

    y0, g0 = jax.value_and_grad(loss(base))(params)
    y1, g1 = jax.value_and_grad(loss(dataclasses.replace(base, remat_3d=True)))(
        params
    )
    assert float(jnp.abs(y0 - y1)) == 0.0
    for k in g0:
        # recompute may reassociate the accumulation: last-ulp tolerance
        np.testing.assert_allclose(
            np.asarray(g0[k]), np.asarray(g1[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )
