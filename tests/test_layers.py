"""Layer-library tests: TF-semantics parity via torch + adjoint oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from rendernet_tpu.nn import layers
from rendernet_tpu.nn.layers import Module


def tf_same_pads(in_size, k, s):
    """TF SAME padding (possibly asymmetric)."""
    out = -(-in_size // s)
    total = max((out - 1) * s + k - in_size, 0)
    return total // 2, total - total // 2


def torch_conv2d_same(x_nhwc, w_hwio, stride):
    """Oracle: TF-layout conv with SAME padding via torch."""
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).double()
    w = torch.from_numpy(np.transpose(w_hwio, (3, 2, 0, 1))).double()
    ph = tf_same_pads(x_nhwc.shape[1], w_hwio.shape[0], stride[0])
    pw = tf_same_pads(x_nhwc.shape[2], w_hwio.shape[1], stride[1])
    x = F.pad(x, (pw[0], pw[1], ph[0], ph[1]))
    y = F.conv2d(x, w, stride=stride)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def torch_conv3d_same(x, w_dhwio, stride):
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))).double()
    wt = torch.from_numpy(np.transpose(w_dhwio, (4, 3, 0, 1, 2))).double()
    pads = [tf_same_pads(x.shape[i + 1], w_dhwio.shape[i], stride[i]) for i in range(3)]
    # F.pad takes pads last-dim-first
    xt = F.pad(
        xt,
        (pads[2][0], pads[2][1], pads[1][0], pads[1][1], pads[0][0], pads[0][1]),
    )
    y = F.conv3d(xt, wt, stride=stride)
    return np.transpose(y.numpy(), (0, 2, 3, 4, 1))


@pytest.mark.parametrize("stride", [(1, 1), (2, 2)])
@pytest.mark.parametrize("hw", [8, 9])
def test_conv2d_matches_tf_same(rng, stride, hw):
    x = rng.standard_normal((2, hw, hw, 3)).astype(np.float32)
    m = Module(rng=jax.random.PRNGKey(0))
    y = layers.conv2d(m, jnp.asarray(x), 5, (4, 4), stride, scope="c", use_bias=False)
    w = np.asarray(m.params["c/weights"])
    oracle = torch_conv2d_same(x, w, stride)
    np.testing.assert_allclose(np.asarray(y), oracle, atol=1e-4)


@pytest.mark.parametrize("stride", [(2, 2, 2), (1, 1, 2)])
def test_conv3d_matches_tf_same(rng, stride):
    x = rng.standard_normal((1, 8, 8, 8, 2)).astype(np.float32)
    m = Module(rng=jax.random.PRNGKey(0))
    y = layers.conv3d(m, jnp.asarray(x), 4, (3, 3, 3), stride, scope="c", use_bias=False)
    w = np.asarray(m.params["c/weights"])
    oracle = torch_conv3d_same(x, w, stride)
    np.testing.assert_allclose(np.asarray(y), oracle, atol=1e-4)


@pytest.mark.parametrize("stride,ksize", [((2, 2), 4), ((1, 1), 4), ((2, 2), 3)])
def test_conv2d_transpose_is_conv_adjoint(rng, stride, ksize):
    """TF conv*_transpose IS the adjoint of the SAME forward conv — verify
    our implementation against jax.linear_transpose of our own conv."""
    b, h, w, cin, cout = 1, 6, 6, 3, 5
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    m = Module(rng=jax.random.PRNGKey(1))
    y = layers.conv2d_transpose(
        m, x, cout, (ksize, ksize), stride, scope="d", use_bias=False
    )
    assert y.shape == (b, h * stride[0], w * stride[1], cout)
    wgt = m.params["d/weights"]  # [kh, kw, out, in]

    def fwd(z):
        # forward conv with the SAME kernel in TF layout [kh,kw,out,in]:
        # conv(z[B,H*s,W*s,out]) -> [B,H,W,in]
        return jax.lax.conv_general_dilated(
            z,
            jnp.transpose(wgt, (0, 1, 2, 3)),  # HWIO with I=out, O=in
            window_strides=stride,
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    z_shape = jax.ShapeDtypeStruct((b, h * stride[0], w * stride[1], cout), jnp.float32)
    (adj,) = jax.linear_transpose(fwd, z_shape)(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(adj), atol=1e-4)


def test_conv3d_transpose_shape_and_adjoint(rng):
    b, d, cin, cout, s = 1, 4, 2, 3, 2
    x = jnp.asarray(rng.standard_normal((b, d, d, d, cin)).astype(np.float32))
    m = Module(rng=jax.random.PRNGKey(2))
    y = layers.conv3d_transpose(m, x, cout, (4, 4, 4), (s, s, s), scope="d", use_bias=False)
    assert y.shape == (b, d * s, d * s, d * s, cout)
    wgt = m.params["d/weights"]

    def fwd(z):
        return jax.lax.conv_general_dilated(
            z, wgt, window_strides=(s, s, s), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    z_shape = jax.ShapeDtypeStruct((b, d * s, d * s, d * s, cout), jnp.float32)
    (adj,) = jax.linear_transpose(fwd, z_shape)(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(adj), atol=1e-4)


def test_prelu_and_param_reuse(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 4)).astype(np.float32))
    m = Module(rng=jax.random.PRNGKey(0))
    y = layers.prelu(m, x)
    # alpha starts at zero -> plain relu
    np.testing.assert_allclose(np.asarray(y), np.maximum(np.asarray(x), 0))
    # apply mode with modified alpha
    params = dict(m.params)
    params["alpha"] = jnp.full((4,), 0.25)
    y2 = layers.prelu(Module(params=params), x)
    xn = np.asarray(x)
    np.testing.assert_allclose(
        np.asarray(y2), np.maximum(xn, 0) + 0.25 * np.minimum(xn, 0), atol=1e-6
    )


def test_res_block_and_projection_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4, 8)).astype(np.float32))
    m = Module(rng=jax.random.PRNGKey(0))
    y = layers.res_block_3d(m, x, 8, scope="res1_1")
    assert y.shape == x.shape
    p = layers.projection_unit(m, y)
    assert p.shape == (1, 6, 6, 32)
    assert "res1_1/con1_3X3/weights" in m.params
    assert "res1_1/conv2_3x3/weights" in m.params
    assert "projection_unit/Conv/weights" in m.params
    assert "projection_unit/alpha" in m.params


def test_dropout_modes(rng):
    x = jnp.ones((4, 100))
    m_eval = Module(params={"_": jnp.zeros(())}, train=False)
    np.testing.assert_array_equal(np.asarray(layers.dropout(m_eval, x, 0.5)), np.asarray(x))
    m_train = Module(
        params={"_": jnp.zeros(())}, train=True, dropout_rng=jax.random.PRNGKey(0)
    )
    y = np.asarray(layers.dropout(m_train, x, 0.5))
    assert set(np.unique(y)).issubset({0.0, 2.0})
    assert 0.3 < (y == 0).mean() < 0.7


def test_fully_connected(rng):
    x = jnp.asarray(rng.standard_normal((3, 7)).astype(np.float32))
    m = Module(rng=jax.random.PRNGKey(0))
    y = layers.fully_connected(m, x, 11, scope="fc")
    w = np.asarray(m.params["fc/weights"])
    b = np.asarray(m.params["fc/biases"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ w + b, atol=1e-5)


def test_res_block_stack_scan_matches_unrolled():
    """lax.scan over stacked per-block params == unrolled blocks (same math,
    same param paths) for both activations and both ndims."""
    import numpy as np
    from rendernet_tpu.nn.layers import Module, res_block_stack

    rng = np.random.default_rng(0)
    for ndim, shape in ((2, (2, 8, 8, 12)), (3, (2, 6, 6, 6, 12))):
        for act in ("prelu", "relu"):
            x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
            m0 = Module(rng=jax.random.PRNGKey(3))
            with m0.scope("encoder"):
                res_block_stack(
                    m0, x, 4, 12, "res_{}", ndim=ndim, activation=act
                )
            params = m0.params
            # prelu alphas init to 0 — randomize so the activation matters
            params = {
                k: (jnp.asarray(rng.standard_normal(v.shape), jnp.float32)
                    if k.endswith("alpha") else v)
                for k, v in params.items()
            }
            outs = []
            for use_scan in (False, True):
                m = Module(params=params)
                with m.scope("encoder"):
                    outs.append(
                        res_block_stack(
                            m, x, 4, 12, "res_{}", ndim=ndim,
                            activation=act, use_scan=use_scan,
                        )
                    )
            np.testing.assert_allclose(
                np.asarray(outs[0]), np.asarray(outs[1]), atol=1e-6
            )


@pytest.mark.parametrize("ci,co,d", [(32, 32, 16), (16, 32, 16), (8, 8, 24)])
def test_depth_packed_conv_matches_plain(rng, ci, co, d):
    """The depth-packed MXU path (values + both grads) equals XLA's plain
    stride-1 SAME conv — it is the same math with MACs regrouped."""
    x = jnp.asarray(rng.standard_normal((2, 4, 4, d, ci)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 3, ci, co)) * 0.1).astype(np.float32)
    )
    f = layers._depth_pack_factor(x, w, (1, 1, 1))
    assert f > 1

    def plain(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME", dimension_numbers=layers._DIMNUMS[3]
        )

    def packed(x, w):
        return layers._depth_packed_conv(x, w, f)

    np.testing.assert_allclose(
        np.asarray(packed(x, w)), np.asarray(plain(x, w)), atol=1e-5
    )
    cot = jnp.asarray(rng.standard_normal(plain(x, w).shape).astype(np.float32))

    def loss(fn):
        return jax.grad(lambda x, w: jnp.sum(fn(x, w) * cot), argnums=(0, 1))

    gx_p, gw_p = loss(packed)(x, w)
    gx_r, gw_r = loss(plain)(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-4)


def test_depth_packed_dispatch_guards(rng):
    """Ineligible shapes (strided, even kernel, indivisible depth, wide
    channels) fall back to the plain lowering; eligible conv3d calls agree
    with the torch oracle when the packed path is forced on."""
    x = rng.standard_normal((1, 6, 6, 16, 4)).astype(np.float32)
    old = layers.DEPTH_PACK
    layers.DEPTH_PACK = True
    try:
        m = Module(rng=jax.random.PRNGKey(1))
        y = layers.conv3d(
            m, jnp.asarray(x), 4, (3, 3, 3), (1, 1, 1), scope="c", use_bias=False
        )
        w = np.asarray(m.params["c/weights"])
        np.testing.assert_allclose(
            np.asarray(y), torch_conv3d_same(x, w, (1, 1, 1)), atol=1e-4
        )
    finally:
        layers.DEPTH_PACK = old
    # guards
    w5 = jnp.zeros((3, 3, 3, 4, 4))
    assert layers._depth_pack_factor(jnp.zeros((1, 6, 6, 16, 4)), w5, (1, 1, 2)) == 1
    assert layers._depth_pack_factor(jnp.zeros((1, 6, 6, 15, 4)), w5, (1, 1, 1)) == 1
    assert (
        layers._depth_pack_factor(
            jnp.zeros((1, 6, 6, 16, 4)), jnp.zeros((4, 3, 3, 4, 4)), (1, 1, 1)
        )
        == 1
    )
    assert (
        layers._depth_pack_factor(
            jnp.zeros((1, 6, 6, 16, 128)), jnp.zeros((3, 3, 3, 128, 128)), (1, 1, 1)
        )
        == 1
    )


def test_preact_res_block_relu_matches_base(rng):
    """_act_conv's preact path for activation='relu' blocks (the
    pretrained/npz-loaded form, tools/layer_util.py:91-121): forward and
    gradients match the two-op base path to fp32 roundoff."""
    import jax

    from rendernet_tpu.nn.layers import Module, res_block_stack

    x0 = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    m = Module(rng=jax.random.PRNGKey(0))
    res_block_stack(m, x0, 2, 16, "rb_{}", ndim=2, activation="relu",
                    use_scan=False)
    params = m.params

    def loss(p, preact, use_scan):
        mm = Module(params=p)
        return jnp.sum(res_block_stack(
            mm, x0, 2, 16, "rb_{}", ndim=2, activation="relu",
            use_scan=use_scan, preact=preact,
        ) ** 2)

    base, gbase = jax.value_and_grad(lambda p: loss(p, False, False))(params)
    for use_scan in (False, True):
        v, g = jax.value_and_grad(
            lambda p: loss(p, True, use_scan)
        )(params)
        assert float(v) == pytest.approx(float(base), rel=1e-7)
        for k in gbase:
            np.testing.assert_allclose(np.asarray(g[k]), np.asarray(gbase[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.parametrize(
    "shape,kern,stride,co",
    [
        ((2, 16, 16, 16, 1), (5, 5, 5), (2, 2, 2), 8),   # shader e_conv1
        ((2, 16, 16, 16, 5), (5, 5, 5), (2, 2, 2), 8),   # texture e_conv1
        ((2, 8, 8, 16, 8), (3, 3, 3), (1, 1, 2), 16),    # e_conv2
        ((1, 8, 8, 8, 4), (4, 4, 4), (2, 2, 2), 8),      # even kernel
        ((1, 12, 8, 8, 3), (3, 3, 3), (3, 1, 2), 8),     # mixed stride 3
    ],
)
def test_phase_conv3d_matches_strided_conv(rng, shape, kern, stride, co):
    """The phase-space rewrite of a strided SAME conv (ops/phase_conv.py)
    is EXACT vs lax.conv_general_dilated — values and both gradients —
    at the encoder shapes it exists for (RenderNet_Shader.py:36-47 /
    RenderNet_Texture_Face_Normal.py:48-60 scaled down)."""
    import jax
    from jax import lax

    from rendernet_tpu.ops.phase_conv import (
        phase_conv3d,
        phase_conv3d_supported,
    )

    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal(kern + (shape[-1], co)).astype(np.float32) * 0.1
    )
    assert phase_conv3d_supported(x.shape, w.shape, stride)

    def ref(x, w):
        return lax.conv_general_dilated(
            x, w, stride, "SAME", dimension_numbers=("NHWDC", "HWDIO", "NHWDC")
        )

    got = phase_conv3d(x, w, stride)
    want = ref(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    gy = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
    gx1, gw1 = jax.vjp(lambda x, w: phase_conv3d(x, w, stride), x, w)[1](gy)
    gx2, gw2 = jax.vjp(ref, x, w)[1](gy)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=2e-5, atol=3e-5)


def test_phase_conv3d_dispatch_in_conv_op(rng):
    """With PHASE_CONV3D forced on, _conv_op's strided-conv output is
    unchanged (exact rewrite) for the e_conv1-shaped call."""
    from jax import lax

    from rendernet_tpu.nn import layers

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 5)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((5, 5, 5, 5, 8)).astype(np.float32) * 0.1
    )
    old = layers.PHASE_CONV3D
    try:
        layers.PHASE_CONV3D = True
        got = layers._conv_op(x, w, (2, 2, 2), 3)
    finally:
        layers.PHASE_CONV3D = old
    want = lax.conv_general_dilated(
        x, w, (2, 2, 2), "SAME", dimension_numbers=("NHWDC", "HWDIO", "NHWDC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_phase_dgrad_hybrid_matches_strided_conv(rng):
    """phase_dgrad_conv3d (XLA fwd/wgrad, phase-space data grad): values
    and BOTH gradients equal lax.conv_general_dilated — the adjoint of
    the identical linear map, just computed at the decimated
    resolution."""
    import jax
    from jax import lax

    from rendernet_tpu.ops.phase_conv import phase_dgrad_conv3d

    stride = (2, 2, 2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 5)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((5, 5, 5, 5, 8)).astype(np.float32) * 0.1
    )

    def ref(x, w):
        return lax.conv_general_dilated(
            x, w, stride, "SAME", dimension_numbers=("NHWDC", "HWDIO", "NHWDC")
        )

    got = phase_dgrad_conv3d(x, w, stride)
    want = ref(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    gy = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
    gx1, gw1 = jax.vjp(lambda x, w: phase_dgrad_conv3d(x, w, stride), x, w)[1](gy)
    gx2, gw2 = jax.vjp(ref, x, w)[1](gy)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=2e-5, atol=3e-5)
