"""Winograd F(2x2,3x3) vs lax.conv: forward, gradients, bf16, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from rendernet_tpu.ops.winograd import winograd3x3, winograd3x3_supported

DN = ("NHWC", "HWIO", "NHWC")


def _ref(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=DN)


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 16, 16),   # even H/W
    (1, 7, 9, 8, 4),     # odd H and W (tail tiles sliced)
    (2, 6, 6, 32, 16),
    (1, 13, 5, 4, 8),
])
def test_winograd_matches_conv_fp32(rng, shape):
    b, h, w_, c, k = shape
    x = jnp.asarray(rng.standard_normal((b, h, w_, c)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, c, k)) * 0.1).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(winograd3x3(x, w)), np.asarray(_ref(x, w)),
        rtol=1e-5, atol=1e-5,
    )


def test_winograd_gradients_match_conv(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 8, 8)) * 0.1).astype(np.float32)
    )

    def loss(fn):
        return lambda xx, ww: jnp.sum(jnp.tanh(fn(xx, ww)))

    gx_w, gw_w = jax.grad(loss(winograd3x3), argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss(_ref), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_r),
                               rtol=1e-5, atol=1e-5)


def test_winograd_bf16_error_bounded(rng):
    """bf16 inputs: Winograd's transform rounding stays within a small
    multiple of the direct conv's own bf16 error (the quantity the
    training-quality A/B would gate)."""
    x32 = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32))
    w32 = jnp.asarray(
        (rng.standard_normal((3, 3, 32, 32)) * 0.1).astype(np.float32)
    )
    exact = np.asarray(_ref(x32, w32))
    scale = np.abs(exact).max()
    conv_bf = np.asarray(
        _ref(x32.astype(jnp.bfloat16).astype(jnp.float32),
             w32.astype(jnp.bfloat16).astype(jnp.float32))
    )
    win_bf = np.asarray(
        winograd3x3(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16))
    ).astype(np.float32)
    err_conv = np.abs(conv_bf - exact).max() / scale
    err_win = np.abs(win_bf - exact).max() / scale
    assert err_win < 6 * max(err_conv, 1e-3), (err_win, err_conv)


def test_winograd_dispatch_envelope():
    assert winograd3x3_supported((2, 64, 64, 1024), (3, 3, 1024, 1024), (1, 1))
    assert not winograd3x3_supported((2, 64, 64, 32), (3, 3, 32, 32), (1, 1))
    assert not winograd3x3_supported(
        (2, 64, 64, 1024), (3, 3, 1024, 1024), (2, 2)
    )
    assert not winograd3x3_supported((2, 64, 64, 1024), (4, 4, 1024, 1024),
                                     (1, 1))


def test_winograd_flag_routes_res_stack(rng, monkeypatch):
    """layers.WINOGRAD_2D routes eligible res-stack convs through the
    Winograd expression with unchanged results."""
    from rendernet_tpu.nn import layers
    from rendernet_tpu.nn.layers import Module, res_block_stack
    from rendernet_tpu.ops import winograd as wg

    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 256)).astype(np.float32))
    m = Module(rng=jax.random.PRNGKey(0))
    res_block_stack(m, x0, 1, 256, "wb_{}", ndim=2, use_scan=False)
    params = m.params

    def run():
        return res_block_stack(
            Module(params=params), x0, 1, 256, "wb_{}", ndim=2,
            use_scan=False,
        )

    base = np.asarray(run())
    calls = []
    orig = wg.winograd3x3
    monkeypatch.setattr(wg, "winograd3x3",
                        lambda x, w: calls.append(1) or orig(x, w))
    monkeypatch.setattr(layers, "WINOGRAD_2D", True)
    got = np.asarray(run())
    assert calls  # the flag actually routed through Winograd
    np.testing.assert_allclose(got, base, rtol=1e-4, atol=1e-5)
