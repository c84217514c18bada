"""Direct TensorFlow-oracle parity tests for the layer library.

The reference is TF 1.x; its exact SAME-padding conventions (asymmetric
pads on even kernels/strides, ``conv2d_transpose`` with explicit
``output_shape``) are the riskiest part of pretrained-weight parity
(tools/layer_util.py:147-310). These tests check our layers against
tf.nn itself — the strongest oracle available short of the released
weights. Runs on TF CPU; skipped when tensorflow isn't installed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

pytestmark = pytest.mark.slow

from rendernet_tpu.nn import layers  # noqa: E402
from rendernet_tpu.nn.layers import Module  # noqa: E402


def _ours(layer_fn, x, w, stride):
    """Run our layer with injected TF-layout weights, no bias."""
    mi = Module(rng=jax.random.PRNGKey(0))
    kernel = w.shape[: x.ndim - 2]
    out_ch = (
        w.shape[-2] if "transpose" in layer_fn.__name__ else w.shape[-1]
    )
    layer_fn(mi, jnp.asarray(x), out_ch, kernel, stride, scope="t",
             use_bias=False)
    (wkey,) = [k for k in mi.params if k.endswith("/weights")]
    m = Module(params={wkey: jnp.asarray(w)})
    return np.asarray(
        layer_fn(m, jnp.asarray(x), out_ch, kernel, stride, scope="t",
                 use_bias=False)
    )


@pytest.mark.parametrize("stride,k,hw", [
    ((1, 1), 3, 8), ((2, 2), 5, 8), ((2, 2), 4, 8), ((2, 2), 3, 7),
    ((1, 2), 4, 6),
])
def test_conv2d_matches_tf(rng, stride, k, hw):
    x = rng.standard_normal((2, hw, hw, 3)).astype(np.float32)
    w = (rng.standard_normal((k, k, 3, 5)) * 0.1).astype(np.float32)
    want = tf.nn.conv2d(x, w, strides=[1, *stride, 1], padding="SAME").numpy()
    got = _ours(layers.conv2d, x, w, stride)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("stride", [(2, 2, 2), (1, 1, 2), (1, 1, 1)])
def test_conv3d_matches_tf(rng, stride):
    x = rng.standard_normal((1, 6, 6, 8, 2)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 3, 2, 4)) * 0.1).astype(np.float32)
    want = tf.nn.conv3d(x, w, strides=[1, *stride, 1], padding="SAME").numpy()
    got = _ours(layers.conv3d, x, w, stride)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("stride,k,hw", [
    ((2, 2), 4, 8),   # the reference deconv chain's upsampling step
    ((1, 1), 4, 8),   # its stride-1 refinement step (even kernel!)
    ((2, 2), 4, 7),   # odd input size
    ((2, 2), 3, 8),   # odd kernel
    ((2, 2), 5, 6),
])
def test_conv2d_transpose_matches_tf(rng, stride, k, hw):
    """tf.nn.conv2d_transpose SAME with output_shape = input*stride —
    the exact call the reference decoder makes (tools/layer_util.py:186)."""
    x = rng.standard_normal((2, hw, hw, 6)).astype(np.float32)
    w = (rng.standard_normal((k, k, 4, 6)) * 0.1).astype(np.float32)  # (out, in)
    out_shape = [2, hw * stride[0], hw * stride[1], 4]
    want = tf.nn.conv2d_transpose(
        x, w, output_shape=out_shape, strides=[1, *stride, 1], padding="SAME"
    ).numpy()
    got = _ours(layers.conv2d_transpose, x, w, stride)
    assert got.shape == tuple(out_shape)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("stride", [(2, 2, 2), (1, 1, 1)])
def test_conv3d_transpose_matches_tf(rng, stride):
    x = rng.standard_normal((1, 4, 4, 6, 3)).astype(np.float32)
    w = (rng.standard_normal((4, 4, 4, 2, 3)) * 0.1).astype(np.float32)
    out_shape = [1, 4 * stride[0], 4 * stride[1], 6 * stride[2], 2]
    want = tf.nn.conv3d_transpose(
        x, w, output_shape=out_shape, strides=[1, *stride, 1], padding="SAME"
    ).numpy()
    got = _ours(layers.conv3d_transpose, x, w, stride)
    assert got.shape == tuple(out_shape)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_params_from_frozen_pb(tmp_path, rng):
    """Round-trip: a frozen GraphDef written by TF itself (consts named by
    variable-scope paths, as convert_variables_to_constants produces)
    imports onto our param template by name."""
    from rendernet_tpu.compat import params_from_frozen_pb

    w = rng.standard_normal((3, 3, 2, 4)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    g = tf.Graph()
    with g.as_default():
        tf.constant(w, name="encoder/e_conv1/e_conv1/weights")
        tf.constant(b, name="encoder/e_conv1/e_conv1/biases")
        tf.constant(np.int32(7), name="some/shape/metadata")
    pb = str(tmp_path / "frozen.pb")
    with open(pb, "wb") as f:
        f.write(g.as_graph_def().SerializeToString())

    template = {
        "encoder/e_conv1/e_conv1/weights": np.zeros((3, 3, 2, 4), np.float32),
        "encoder/e_conv1/e_conv1/biases": np.zeros((4,), np.float32),
    }
    params = params_from_frozen_pb(template, pb)
    np.testing.assert_array_equal(params["encoder/e_conv1/e_conv1/weights"], w)
    np.testing.assert_array_equal(params["encoder/e_conv1/e_conv1/biases"], b)

    # strict mode flags missing keys; shape mismatches always raise
    template["missing/weights"] = np.zeros((1,), np.float32)
    with pytest.raises(KeyError):
        params_from_frozen_pb(template, pb)
    bad = {"encoder/e_conv1/e_conv1/weights": np.zeros((1, 1, 2, 4), np.float32)}
    with pytest.raises(ValueError):
        params_from_frozen_pb(bad, pb)


def test_full_shader_network_matches_tf_mirror(rng):
    """Rebuild the entire shader network in raw tf.nn ops from OUR exported
    params (same paths, same TF-layout kernels) and compare outputs on the
    same camera-grid input — end-to-end wiring/activation/padding parity
    with a TF graph of the reference architecture (RenderNet_Shader.py:32-131),
    without needing the released weights."""
    from rendernet_tpu.models.shader import (
        ShaderConfig,
        init_shader_params,
        shader_rendernet,
    )

    cfg = ShaderConfig(out_channels=1, enc_channels=(2, 2, 4), res1_blocks=1,
                       res2_blocks=1, res3_blocks=1, base=2, new_size=16)
    params = {
        k: np.asarray(v)
        for k, v in init_shader_params(jax.random.PRNGKey(3), cfg).items()
    }
    # Give the zero-initialized PReLU alphas real values so the negative
    # branch is actually exercised.
    rng2 = np.random.default_rng(5)
    for k in params:
        if k.endswith("alpha"):
            params[k] = rng2.uniform(0.1, 0.5, params[k].shape).astype(np.float32)

    vox = rng.standard_normal((1, 16, 16, 16, 1)).astype(np.float32)

    ours = np.asarray(
        shader_rendernet(Module(params={k: jnp.asarray(v) for k, v in params.items()}),
                         jnp.asarray(vox), cfg)
    )

    # ---- TF mirror ----
    P = {k: tf.constant(v) for k, v in params.items()}

    def prelu(x, path):
        return tf.maximum(x, 0.0) + P[path + "/alpha"] * tf.minimum(x, 0.0)

    def conv(x, path, stride, nd=2):
        s = [1, *stride, 1]
        op = tf.nn.conv3d if nd == 3 else tf.nn.conv2d
        return op(x, P[path + "/weights"], strides=s, padding="SAME") + P[
            path + "/biases"]

    def deconv(x, path, stride):
        w = P[path + "/weights"]  # [kh, kw, out, in]
        b, h, wd, _ = x.shape
        out_shape = [b, h * stride[0], wd * stride[1], w.shape[2]]
        return tf.nn.conv2d_transpose(
            x, w, output_shape=out_shape, strides=[1, *stride, 1],
            padding="SAME") + P[path + "/biases"]

    def res_block(x, path, nd=2):
        net = conv(x, f"{path}/con1_3X3", (1,) * nd, nd)
        net = prelu(net, path)
        net = conv(net, f"{path}/conv2_3x3", (1,) * nd, nd)
        return net + x

    x = tf.constant(vox)
    x = prelu(conv(x, "encoder/e_conv1/e_conv1", (2, 2, 2), 3), "encoder/e_conv1")
    x = prelu(conv(x, "encoder/e_conv2/e_conv2", (1, 1, 2), 3), "encoder/e_conv2")
    x = prelu(conv(x, "encoder/e_conv3/e_conv3", (1, 1, 1), 3), "encoder/e_conv3")
    shortcut = x
    x = res_block(x, "encoder/res1_1", nd=3)
    x = conv(x, "encoder/res1_skip/con1_3X3", (1, 1, 1), 3) + shortcut
    b, h, w, d, c = x.shape
    x = tf.reshape(x, [b, h, w, d * c])
    x = prelu(conv(x, "encoder/projection_unit/Conv", (1, 1)),
              "encoder/projection_unit")
    shortcut = x
    x = res_block(x, "encoder/res2_1")
    x = conv(x, "encoder/res2_skip/con1_3X3", (1, 1)) + shortcut
    x = prelu(conv(x, "encoder/e_conv5/e_conv5", (1, 1)), "encoder/e_conv5")
    shortcut = x
    x = res_block(x, "encoder/res3_1")
    x = conv(x, "encoder/res3_skip/con1_3X3", (1, 1)) + shortcut
    x = prelu(conv(x, "encoder/e_conv6/e_conv6", (1, 1)), "encoder/e_conv6")
    x = prelu(deconv(x, "encoder/e_conv7/e_conv7", (2, 2)), "encoder/e_conv7")
    x = prelu(deconv(x, "encoder/e_conv7_1/e_conv7_1", (1, 1)), "encoder/e_conv7_1")
    x = prelu(deconv(x, "encoder/e_conv8/e_conv8", (2, 2)), "encoder/e_conv8")
    x = prelu(deconv(x, "encoder/e_conv9/e_conv9", (2, 2)), "encoder/e_conv9")
    x = prelu(deconv(x, "encoder/e_conv10/e_conv10", (1, 1)), "encoder/e_conv10")
    x = tf.sigmoid(deconv(x, "encoder/e_conv11", (1, 1)))

    np.testing.assert_allclose(ours, x.numpy(), atol=2e-5)


def test_texture_decoder_matches_tf_mirror(rng):
    """Texture decoder (FC -> reshape -> deconv3d/deconv3d/conv3d, PReLU
    everywhere; RenderNet_Texture_Face_Normal.py:34-46) vs raw tf.nn."""
    from rendernet_tpu.models.texture_face import texture_decoder

    mi = Module(rng=jax.random.PRNGKey(1))
    z = rng.standard_normal((1, 199)).astype(np.float32) * 0.3
    texture_decoder(mi, jnp.asarray(z))
    params = {k: np.asarray(v) for k, v in mi.params.items()}
    rng2 = np.random.default_rng(6)
    for k in params:
        if k.endswith("alpha"):
            params[k] = rng2.uniform(0.1, 0.5, params[k].shape).astype(np.float32)

    ours = np.asarray(
        texture_decoder(Module(params={k: jnp.asarray(v) for k, v in params.items()}),
                        jnp.asarray(z))
    )

    P = {k: tf.constant(v) for k, v in params.items()}

    def prelu(x, path):
        return tf.maximum(x, 0.0) + P[path + "/alpha"] * tf.minimum(x, 0.0)

    def deconv3(x, path, stride):
        w = P[path + "/weights"]
        b, d, h, wd, _ = x.shape
        out_shape = [b, d * stride, h * stride, wd * stride, w.shape[3]]
        return tf.nn.conv3d_transpose(
            x, w, output_shape=out_shape, strides=[1, stride, stride, stride, 1],
            padding="SAME") + P[path + "/biases"]

    t = "texture_encoder"
    x = tf.constant(z)
    x = tf.matmul(x, P[f"{t}/e_tex_fc1/fully_connected/weights"]) + P[
        f"{t}/e_tex_fc1/fully_connected/biases"]
    x = prelu(x, f"{t}/e_tex_fc1")
    x = tf.reshape(x, [1, 32, 32, 32, 4])
    x = prelu(deconv3(x, f"{t}/e_tex_conv0/conv3d_transpose", 1), f"{t}/e_tex_conv0")
    x = prelu(deconv3(x, f"{t}/e_tex_conv1/conv3d_transpose", 2), f"{t}/e_tex_conv1")
    x = tf.nn.conv3d(x, P[f"{t}/e_tex_conv2/conv3d/weights"],
                     strides=[1] * 5, padding="SAME") + P[
        f"{t}/e_tex_conv2/conv3d/biases"]
    x = prelu(x, f"{t}/e_tex_conv2")

    np.testing.assert_allclose(ours, x.numpy(), atol=2e-5)


def test_two_head_texture_net_matches_tf_mirror(rng):
    """Two-head texture/normal RenderNet (trunk + Image/Normal heads incl.
    the reference's e_conv7_2 scope quirk) vs raw tf.nn."""
    from rendernet_tpu.models.texture_face import (
        TextureFaceConfig,
        init_texture_face_params,
        texture_face_rendernet,
    )

    cfg = TextureFaceConfig(enc_channels=(2, 2, 2), res1_blocks=1,
                            res2_blocks=1, res3_blocks=1, base=2, new_size=16)
    params = {
        k: np.asarray(v)
        for k, v in init_texture_face_params(jax.random.PRNGKey(2), cfg).items()
    }
    rng2 = np.random.default_rng(7)
    for k in params:
        if k.endswith("alpha"):
            params[k] = rng2.uniform(0.1, 0.5, params[k].shape).astype(np.float32)

    vox = rng.standard_normal((1, 8, 8, 16, 5)).astype(np.float32)
    ours_albedo, ours_normal = texture_face_rendernet(
        Module(params={k: jnp.asarray(v) for k, v in params.items()}),
        jnp.asarray(vox), cfg,
    )

    P = {k: tf.constant(v) for k, v in params.items()}

    def prelu(x, path):
        return tf.maximum(x, 0.0) + P[path + "/alpha"] * tf.minimum(x, 0.0)

    def conv(x, path, stride, nd=2):
        op = tf.nn.conv3d if nd == 3 else tf.nn.conv2d
        return op(x, P[path + "/weights"], strides=[1, *stride, 1],
                  padding="SAME") + P[path + "/biases"]

    def deconv(x, path, stride):
        w = P[path + "/weights"]
        b, h, wd, _ = x.shape
        out_shape = [b, h * stride, wd * stride, w.shape[2]]
        return tf.nn.conv2d_transpose(
            x, w, output_shape=out_shape, strides=[1, stride, stride, 1],
            padding="SAME") + P[path + "/biases"]

    def res_block(x, path, nd=2):
        net = conv(x, f"{path}/con1_3X3", (1,) * nd, nd)
        net = prelu(net, path)
        net = conv(net, f"{path}/conv2_3x3", (1,) * nd, nd)
        return net + x

    x = tf.constant(vox)
    x = prelu(conv(x, "encoder/e_conv1/e_conv1", (2, 2, 2), 3), "encoder/e_conv1")
    x = prelu(conv(x, "encoder/e_conv2/e_conv2", (1, 1, 2), 3), "encoder/e_conv2")
    x = prelu(conv(x, "encoder/e_conv3/e_conv3", (1, 1, 1), 3), "encoder/e_conv3")
    shortcut = x
    x = res_block(x, "encoder/res1_1", nd=3)
    x = conv(x, "encoder/res1_skip/con1_3X3", (1, 1, 1), 3) + shortcut
    b, h, w, d, c = x.shape
    x = tf.reshape(x, [b, h, w, d * c])
    x = prelu(conv(x, "encoder/projection_unit/Conv", (1, 1)),
              "encoder/projection_unit")
    shortcut = x
    x = res_block(x, "encoder/res2_1")
    x = conv(x, "encoder/res2_skip/con1_3X3", (1, 1)) + shortcut
    x = prelu(conv(x, "encoder/e_conv5/e_conv5", (1, 1)), "encoder/e_conv5")
    shortcut = x
    x = res_block(x, "encoder/res3_1")
    trunk = conv(x, "encoder/res3_skip/con1_3X3", (1, 1)) + shortcut

    def head(name, sfx, conv8_scope, conv9_scope, conv10_scope):
        y = prelu(conv(trunk, f"encoder/{name}/e_conv6{sfx}/e_conv6{sfx}", (1, 1)),
                  f"encoder/{name}/e_conv6{sfx}")
        y = prelu(deconv(y, f"encoder/{name}/e_conv7{sfx}/e_conv7_2", 2),
                  f"encoder/{name}/e_conv7{sfx}")
        y = prelu(deconv(y, f"encoder/{name}/e_conv8{sfx}/{conv8_scope}", 2),
                  f"encoder/{name}/e_conv8{sfx}")
        y = prelu(deconv(y, f"encoder/{name}/e_conv9{sfx}/{conv9_scope}", 2),
                  f"encoder/{name}/e_conv9{sfx}")
        return tf.sigmoid(deconv(y, f"encoder/{name}/e_conv10{sfx}/{conv10_scope}", 1))

    tf_albedo = head("Image", "_1", "conv2d_transpose", "conv2d_transpose",
                     "conv2d_transpose")
    tf_normal = head("Normal", "_2", "e_conv8_2", "e_conv9_2", "e_conv10_2")

    np.testing.assert_allclose(np.asarray(ours_albedo), tf_albedo.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours_normal), tf_normal.numpy(), atol=2e-5)


def test_shape_decoder_matches_tf_mirror(rng):
    """Inverse-rendering shape decoder (FC -> 4x elu deconv3d s2 -> s1 +
    sigmoid; Reconstruct_RenderNet_Face.py:31-75) vs raw tf.nn."""
    from rendernet_tpu.models.decoders import (
        init_shape_decoder_params,
        shape_decoder_3d,
    )

    z = rng.standard_normal((1, 16)).astype(np.float32)
    params = {
        k: np.asarray(v)
        for k, v in init_shape_decoder_params(jax.random.PRNGKey(4), z_dim=16).items()
    }
    ours = np.asarray(
        shape_decoder_3d(Module(params={k: jnp.asarray(v) for k, v in params.items()}),
                         jnp.asarray(z))
    )

    P = {k: tf.constant(v) for k, v in params.items()}

    def deconv3(x, path, stride, out_ch):
        w = P[path + "/weights"]
        b, d, h, wd, _ = x.shape
        out_shape = [b, d * stride, h * stride, wd * stride, out_ch]
        return tf.nn.conv3d_transpose(
            x, w, output_shape=out_shape, strides=[1, stride, stride, stride, 1],
            padding="SAME") + P[path + "/biases"]

    x = tf.matmul(tf.constant(z), P["g_zP/g_gc1/weights"]) + P["g_zP/g_gc1/biases"]
    x = tf.reshape(x, [1, 4, 4, 4, 256])
    for ch, name in ((128, "g_conv1"), (64, "g_conv2"), (32, "g_conv3"),
                     (16, "g_conv4")):
        x = tf.nn.elu(deconv3(x, f"{name}/{name}", 2, ch))
    x = tf.sigmoid(deconv3(x, "g_conv5", 1, 1))
    np.testing.assert_allclose(ours, x.numpy(), atol=2e-5)


def test_recon_rendernet_matches_tf_mirror(rng):
    """The frozen inverse-rendering renderer (raw-reshape projection +
    e_conv4, relu res blocks, e_conv11 head quirks;
    Reconstruct_RenderNet_Face.py:113-302) vs raw tf.nn."""
    from rendernet_tpu.models.decoders import (
        init_recon_rendernet_params,
        recon_rendernet,
    )

    params = {
        k: np.asarray(v)
        for k, v in init_recon_rendernet_params(
            jax.random.PRNGKey(5), new_size=16).items()
    }
    rng2 = np.random.default_rng(8)
    for k in params:
        if k.endswith("alpha"):
            params[k] = rng2.uniform(0.1, 0.5, params[k].shape).astype(np.float32)

    vox = rng.standard_normal((1, 8, 8, 16, 5)).astype(np.float32)
    ours_albedo, ours_normal = recon_rendernet(
        Module(params={k: jnp.asarray(v) for k, v in params.items()}),
        jnp.asarray(vox),
    )

    P = {k: tf.constant(v) for k, v in params.items()}

    def prelu(x, path):
        return tf.maximum(x, 0.0) + P[path + "/alpha"] * tf.minimum(x, 0.0)

    def conv(x, path, stride, nd=2):
        op = tf.nn.conv3d if nd == 3 else tf.nn.conv2d
        return op(x, P[path + "/weights"], strides=[1, *stride, 1],
                  padding="SAME") + P[path + "/biases"]

    def deconv(x, path, stride, out_ch):
        w = P[path + "/weights"]
        b, h, wd, _ = x.shape
        out_shape = [b, h * stride, wd * stride, out_ch]
        return tf.nn.conv2d_transpose(
            x, w, output_shape=out_shape, strides=[1, stride, stride, 1],
            padding="SAME") + P[path + "/biases"]

    def res_block_relu(x, path, nd=2):
        net = conv(x, f"{path}/con1_3X3", (1,) * nd, nd)
        net = tf.nn.relu(net)
        net = conv(net, f"{path}/conv2_3x3", (1,) * nd, nd)
        return net + x

    x = tf.constant(vox)
    x = prelu(conv(x, "encoder/e_conv1/e_conv1", (2, 2, 2), 3), "encoder/e_conv1")
    x = prelu(conv(x, "encoder/e_conv2/e_conv2", (1, 1, 2), 3), "encoder/e_conv2")
    x = prelu(conv(x, "encoder/e_conv3/e_conv3", (1, 1, 1), 3), "encoder/e_conv3")
    shortcut = x
    for i in range(1, 11):
        x = res_block_relu(x, f"encoder/res1_{i}", nd=3)
    x = conv(x, "encoder/res1_skip/con1_3X3", (1, 1, 1), 3) + shortcut
    b, h, w, d, c = x.shape
    x = tf.reshape(x, [b, h, w, d * c])
    x = prelu(conv(x, "encoder/e_conv4/e_conv4", (1, 1)), "encoder/e_conv4")
    shortcut = x
    for i in range(1, 11):
        x = res_block_relu(x, f"encoder/res2_{i}")
    x = conv(x, "encoder/res2_skip/con1_3X3", (1, 1)) + shortcut
    x = prelu(conv(x, "encoder/e_conv5/e_conv5", (1, 1)), "encoder/e_conv5")
    shortcut = x
    for i in range(1, 6):
        x = res_block_relu(x, f"encoder/res3_{i}")
    trunk = conv(x, "encoder/res3_skip/con1_3X3", (1, 1)) + shortcut

    def tf_head(name, sfx, final_outer):
        y = prelu(conv(trunk, f"encoder/{name}/e_conv6{sfx}/e_conv6{sfx}", (1, 1)),
                  f"encoder/{name}/e_conv6{sfx}")
        y = prelu(deconv(y, f"encoder/{name}/e_conv7{sfx}/e_conv7{sfx}", 2, 64),
                  f"encoder/{name}/e_conv7{sfx}")
        y = prelu(deconv(y, f"encoder/{name}/e_conv8{sfx}/e_conv8{sfx}", 2, 32),
                  f"encoder/{name}/e_conv8{sfx}")
        y = prelu(deconv(y, f"encoder/{name}/e_conv9{sfx}/e_conv9{sfx}", 2, 16),
                  f"encoder/{name}/e_conv9{sfx}")
        return tf.sigmoid(
            deconv(y, f"encoder/{name}/{final_outer}/e_conv11{sfx}", 1, 3)
        )

    tf_albedo = tf_head("Image", "_1", "e_conv11_1")
    tf_normal = tf_head("Normal", "_2", "e_conv11")
    np.testing.assert_allclose(np.asarray(ours_albedo), tf_albedo.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours_normal), tf_normal.numpy(), atol=2e-5)


def test_adam_staircase_trajectory_matches_tf(rng):
    """10 optimizer steps on a non-convex toy objective: our
    exponential-staircase Adam(b1=0.5) tracks
    tf.compat.v1.train.AdamOptimizer + exponential_decay(staircase=True)
    to float32 roundoff (RenderNet_Shader.py:166-167 semantics)."""
    from rendernet_tpu.train.optim import make_optimizer

    w0 = rng.standard_normal(4).astype(np.float32)

    v = tf.Variable(w0)
    gstep = tf.Variable(0, dtype=tf.int64)
    lr = tf.compat.v1.train.exponential_decay(1e-2, gstep, 3, 0.96,
                                              staircase=True)
    opt = tf.compat.v1.train.AdamOptimizer(lr, beta1=0.5)
    tf_tr = []
    for _ in range(10):
        with tf.GradientTape() as t:
            loss = tf.reduce_sum(tf.sin(v) * v**2)
        opt.apply_gradients([(t.gradient(loss, v), v)], global_step=gstep)
        tf_tr.append(v.numpy().copy())

    tx = make_optimizer(1e-2, 3, 0.96)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum(jnp.sin(p["w"]) * p["w"] ** 2)

    for i in range(10):
        upd, state = tx.update(jax.grad(loss_fn)(params), state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        np.testing.assert_allclose(np.asarray(params["w"]), tf_tr[i], atol=2e-6)


def test_full_shader_network_gradients_match_tf(rng):
    """Pixel-gradient parity (BASELINE.md north-star clause 2): d loss /
    d voxel-grid through the ENTIRE shader network matches TF's autodiff
    of the mirror graph."""
    from rendernet_tpu.models.shader import (
        ShaderConfig,
        init_shader_params,
        shader_rendernet,
    )

    cfg = ShaderConfig(out_channels=1, enc_channels=(2, 2, 4), res1_blocks=1,
                       res2_blocks=1, res3_blocks=1, base=2, new_size=16)
    params = {
        k: np.asarray(v)
        for k, v in init_shader_params(jax.random.PRNGKey(3), cfg).items()
    }
    rng2 = np.random.default_rng(5)
    for k in params:
        if k.endswith("alpha"):
            params[k] = rng2.uniform(0.1, 0.5, params[k].shape).astype(np.float32)
    vox = rng.standard_normal((1, 16, 16, 16, 1)).astype(np.float32)
    probe = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)

    def jloss(v):
        out = shader_rendernet(
            Module(params={k: jnp.asarray(p) for k, p in params.items()}),
            v, cfg,
        )
        return jnp.sum(out * probe)

    ours = np.asarray(jax.grad(jloss)(jnp.asarray(vox)))

    P = {k: tf.constant(v) for k, v in params.items()}

    def prelu(x, path):
        return tf.maximum(x, 0.0) + P[path + "/alpha"] * tf.minimum(x, 0.0)

    def conv(x, path, stride, nd=2):
        op = tf.nn.conv3d if nd == 3 else tf.nn.conv2d
        return op(x, P[path + "/weights"], strides=[1, *stride, 1],
                  padding="SAME") + P[path + "/biases"]

    def deconv(x, path, stride, out_ch):
        w = P[path + "/weights"]
        b, h, wd, _ = x.shape
        out_shape = [b, h * stride, wd * stride, out_ch]
        return tf.nn.conv2d_transpose(
            x, w, output_shape=out_shape, strides=[1, stride, stride, 1],
            padding="SAME") + P[path + "/biases"]

    def res_block(x, path, nd=2):
        net = conv(x, f"{path}/con1_3X3", (1,) * nd, nd)
        net = prelu(net, path)
        net = conv(net, f"{path}/conv2_3x3", (1,) * nd, nd)
        return net + x

    vt = tf.Variable(vox)
    with tf.GradientTape() as tape:
        x = vt
        x = prelu(conv(x, "encoder/e_conv1/e_conv1", (2, 2, 2), 3), "encoder/e_conv1")
        x = prelu(conv(x, "encoder/e_conv2/e_conv2", (1, 1, 2), 3), "encoder/e_conv2")
        x = prelu(conv(x, "encoder/e_conv3/e_conv3", (1, 1, 1), 3), "encoder/e_conv3")
        shortcut = x
        x = res_block(x, "encoder/res1_1", nd=3)
        x = conv(x, "encoder/res1_skip/con1_3X3", (1, 1, 1), 3) + shortcut
        b, h, w, d, c = x.shape
        x = tf.reshape(x, [b, h, w, d * c])
        x = prelu(conv(x, "encoder/projection_unit/Conv", (1, 1)),
                  "encoder/projection_unit")
        shortcut = x
        x = res_block(x, "encoder/res2_1")
        x = conv(x, "encoder/res2_skip/con1_3X3", (1, 1)) + shortcut
        x = prelu(conv(x, "encoder/e_conv5/e_conv5", (1, 1)), "encoder/e_conv5")
        shortcut = x
        x = res_block(x, "encoder/res3_1")
        x = conv(x, "encoder/res3_skip/con1_3X3", (1, 1)) + shortcut
        x = prelu(conv(x, "encoder/e_conv6/e_conv6", (1, 1)), "encoder/e_conv6")
        x = prelu(deconv(x, "encoder/e_conv7/e_conv7", 2, 8), "encoder/e_conv7")
        x = prelu(deconv(x, "encoder/e_conv7_1/e_conv7_1", 1, 8), "encoder/e_conv7_1")
        x = prelu(deconv(x, "encoder/e_conv8/e_conv8", 2, 4), "encoder/e_conv8")
        x = prelu(deconv(x, "encoder/e_conv9/e_conv9", 2, 2), "encoder/e_conv9")
        x = prelu(deconv(x, "encoder/e_conv10/e_conv10", 1, 16), "encoder/e_conv10")
        x = tf.sigmoid(deconv(x, "encoder/e_conv11", 1, 1))
        loss = tf.reduce_sum(x * probe)
    want = tape.gradient(loss, vt).numpy()
    np.testing.assert_allclose(ours, want, atol=3e-5)


def test_full_depth_shader_matches_tf_mirror_both_stack_forms(rng):
    """Full-DEPTH parity: production block counts (10/10/5), production
    channels (8/16/32, 1024-wide res2) and a 128-deep camera grid — only
    the spatial grid is reduced (16x16) to stay CPU-feasible. Checks the
    TF mirror against BOTH stack forms (unrolled and the lax.scan stack,
    which gathers per-block params along a leading axis — a path the toy
    mirrors never exercised), forward AND gradients (voxels + params deep
    inside the scanned stack). Architecture: RenderNet_Shader.py:32-131."""
    from rendernet_tpu.models.shader import (
        ShaderConfig,
        init_shader_params,
        shader_rendernet,
    )

    cfg = ShaderConfig(out_channels=1, new_size=128)  # production defaults
    params = {
        k: np.asarray(v)
        for k, v in init_shader_params(jax.random.PRNGKey(3), cfg).items()
    }
    rng2 = np.random.default_rng(5)
    for k in params:
        if k.endswith("alpha"):
            params[k] = rng2.uniform(0.1, 0.5, params[k].shape).astype(
                np.float32
            )

    vox = (rng.standard_normal((1, 16, 16, 128, 1)) * 0.5).astype(np.float32)
    probe = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)
    watched = [
        "encoder/res2_5/con1_3X3/weights",  # deep inside the scanned stack
        "encoder/res2_5/alpha",
        "encoder/res3_3/conv2_3x3/biases",
    ]

    def jrun(use_scan):
        scfg = ShaderConfig(out_channels=1, new_size=128,
                            scan_blocks=use_scan)

        def loss_fn(p, v):
            out = shader_rendernet(Module(params=p), v, scfg)
            return jnp.sum(out * probe), out

        jp = {k: jnp.asarray(v) for k, v in params.items()}
        (loss, out), grads = jax.value_and_grad(
            lambda p, v: loss_fn(p, v), has_aux=True, argnums=(0, 1)
        )(jp, jnp.asarray(vox))
        return (
            np.asarray(out),
            np.asarray(grads[1]),
            {k: np.asarray(grads[0][k]) for k in watched},
        )

    out_unroll, gv_unroll, gp_unroll = jrun(False)
    out_scan, gv_scan, gp_scan = jrun(True)

    # ---- TF mirror at full depth ----
    P = {k: tf.constant(v) for k, v in params.items()}

    def prelu(x, path):
        return tf.maximum(x, 0.0) + P[path + "/alpha"] * tf.minimum(x, 0.0)

    def conv(x, path, stride, nd=2):
        op = tf.nn.conv3d if nd == 3 else tf.nn.conv2d
        return op(x, P[path + "/weights"], strides=[1, *stride, 1],
                  padding="SAME") + P[path + "/biases"]

    def deconv(x, path, stride):
        w = P[path + "/weights"]
        b, h, wd, _ = x.shape
        out_shape = [b, h * stride, wd * stride, w.shape[2]]
        return tf.nn.conv2d_transpose(
            x, w, output_shape=out_shape, strides=[1, stride, stride, 1],
            padding="SAME") + P[path + "/biases"]

    def res_block(x, path, nd=2):
        net = conv(x, f"{path}/con1_3X3", (1,) * nd, nd)
        net = prelu(net, path)
        net = conv(net, f"{path}/conv2_3x3", (1,) * nd, nd)
        return net + x

    vt = tf.Variable(vox)
    with tf.GradientTape() as tape:
        for k in watched:
            tape.watch(P[k])
        x = vt
        x = prelu(conv(x, "encoder/e_conv1/e_conv1", (2, 2, 2), 3),
                  "encoder/e_conv1")
        x = prelu(conv(x, "encoder/e_conv2/e_conv2", (1, 1, 2), 3),
                  "encoder/e_conv2")
        x = prelu(conv(x, "encoder/e_conv3/e_conv3", (1, 1, 1), 3),
                  "encoder/e_conv3")
        shortcut = x
        for i in range(1, cfg.res1_blocks + 1):
            x = res_block(x, f"encoder/res1_{i}", nd=3)
        x = conv(x, "encoder/res1_skip/con1_3X3", (1, 1, 1), 3) + shortcut
        b, h, w, d, c = x.shape
        x = tf.reshape(x, [b, h, w, d * c])
        x = prelu(conv(x, "encoder/projection_unit/Conv", (1, 1)),
                  "encoder/projection_unit")
        shortcut = x
        for i in range(1, cfg.res2_blocks + 1):
            x = res_block(x, f"encoder/res2_{i}")
        x = conv(x, "encoder/res2_skip/con1_3X3", (1, 1)) + shortcut
        x = prelu(conv(x, "encoder/e_conv5/e_conv5", (1, 1)),
                  "encoder/e_conv5")
        shortcut = x
        for i in range(1, cfg.res3_blocks + 1):
            x = res_block(x, f"encoder/res3_{i}")
        x = conv(x, "encoder/res3_skip/con1_3X3", (1, 1)) + shortcut
        x = prelu(conv(x, "encoder/e_conv6/e_conv6", (1, 1)),
                  "encoder/e_conv6")
        x = prelu(deconv(x, "encoder/e_conv7/e_conv7", 2), "encoder/e_conv7")
        x = prelu(deconv(x, "encoder/e_conv7_1/e_conv7_1", 1),
                  "encoder/e_conv7_1")
        x = prelu(deconv(x, "encoder/e_conv8/e_conv8", 2), "encoder/e_conv8")
        x = prelu(deconv(x, "encoder/e_conv9/e_conv9", 2), "encoder/e_conv9")
        x = prelu(deconv(x, "encoder/e_conv10/e_conv10", 1),
                  "encoder/e_conv10")
        x = tf.sigmoid(deconv(x, "encoder/e_conv11", 1))
        loss = tf.reduce_sum(x * tf.constant(probe))
    want_out = x.numpy()
    grads_tf = tape.gradient(loss, [vt] + [P[k] for k in watched])
    want_gv = grads_tf[0].numpy()
    want_gp = {k: g.numpy() for k, g in zip(watched, grads_tf[1:])}

    # 35 convs deep at 1024 channels: fp32 accumulation-order differences
    # (XLA vs TF oneDNN) compound through the chain. Measured at this
    # depth/width: max |err| = 0.4% of the peak-gradient magnitude, rms
    # err = 0.07% of it — tolerances sit at ~2.5x those. (At toy depth
    # the other mirror tests bound the same comparisons at ~1e-5.)
    for got, tag in ((out_unroll, "unroll"), (out_scan, "scan")):
        np.testing.assert_allclose(got, want_out, atol=5e-5, err_msg=tag)

    def close(got, want, tag):
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=1e-2 * scale, err_msg=tag)
        rms = np.sqrt(((got - want) ** 2).mean())
        assert rms < 2e-3 * scale, f"{tag}: rms {rms} vs scale {scale}"

    close(gv_unroll, want_gv, "unroll")
    close(gv_scan, want_gv, "scan")
    for k in watched:
        close(gp_unroll[k], want_gp[k], k)
        close(gp_scan[k], want_gp[k], "scan " + k)
