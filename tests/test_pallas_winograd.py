"""Fused Pallas Winograd F(2x2,3x3) vs the XLA expression and lax conv.

The kernel (ops/pallas_winograd.py) implements the identical algorithm to
ops/winograd.py (fp32 transforms, caller-dtype GEMM operands), so the two
must agree to fp32-GEMM roundoff; both match lax.conv to transform
roundoff (bounded in tests/test_winograd.py). CPU runs the kernel in
interpret mode (same code path Mosaic compiles on TPU).

Reference semantics anchor: tools/layer_util.py:91-121 (3x3 stride-1
SAME res-block convs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from rendernet_tpu.ops.pallas_winograd import (
    TILE_OVERRIDE,
    wino_conv2d,
    wino_conv2d_supported,
)
from rendernet_tpu.ops import pallas_winograd
from rendernet_tpu.ops.winograd import winograd3x3

DN = ("NHWC", "HWIO", "NHWC")


def _data(b, h, w, c, k, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    wt = jnp.asarray(
        (rng.standard_normal((3, 3, c, k)) * 0.05).astype(np.float32)
    )
    return x, wt


def test_supported_envelope():
    assert wino_conv2d_supported((24, 64, 64, 1024), (3, 3, 1024, 1024), (1, 1))
    assert wino_conv2d_supported((8, 16, 16, 256), (3, 3, 256, 256), (1, 1))
    # odd spatial, narrow channels, stride, non-3x3 all rejected
    assert not wino_conv2d_supported((8, 15, 16, 256), (3, 3, 256, 256), (1, 1))
    assert not wino_conv2d_supported((8, 16, 16, 64), (3, 3, 64, 64), (1, 1))
    assert not wino_conv2d_supported((8, 16, 16, 256), (3, 3, 256, 256), (2, 2))
    assert not wino_conv2d_supported((8, 16, 16, 256), (5, 5, 256, 256), (1, 1))


@pytest.mark.parametrize("shape", [(8, 16, 16, 256, 256), (2, 8, 12, 256, 128)])
def test_matches_xla_winograd_and_conv(shape):
    b, h, w, c, k = shape
    x, wt = _data(b, h, w, c, k)
    y_kernel = wino_conv2d(x, wt)
    y_wino = winograd3x3(x, wt)
    y_conv = lax.conv_general_dilated(x, wt, (1, 1), "SAME",
                                      dimension_numbers=DN)
    # same algorithm -> tight; vs conv -> transform roundoff only
    np.testing.assert_allclose(
        np.asarray(y_kernel), np.asarray(y_wino), atol=2e-4, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(y_kernel), np.asarray(y_conv), atol=5e-4, rtol=1e-4
    )


def test_multi_tile_grid():
    """Exercise every grid axis: K blocks, batch blocks, tile-row blocks."""
    b, h, w, c, k = 16, 8, 8, 256, 256
    x, wt = _data(b, h, w, c, k, seed=1)
    old = pallas_winograd.TILE_OVERRIDE
    pallas_winograd.TILE_OVERRIDE = (128, 8, 2)  # (bn, bb, th)
    try:
        y_kernel = wino_conv2d(x, wt)
    finally:
        pallas_winograd.TILE_OVERRIDE = old
    y_conv = lax.conv_general_dilated(x, wt, (1, 1), "SAME",
                                      dimension_numbers=DN)
    np.testing.assert_allclose(
        np.asarray(y_kernel), np.asarray(y_conv), atol=5e-4, rtol=1e-4
    )


def test_grads_match_conv():
    b, h, w, c, k = 2, 8, 8, 256, 256
    x, wt = _data(b, h, w, c, k, seed=2)

    def loss_kernel(xx, ww):
        y = wino_conv2d(xx, ww)
        return jnp.sum(y * jnp.cos(y.astype(jnp.float32)))

    def loss_conv(xx, ww):
        y = lax.conv_general_dilated(xx, ww, (1, 1), "SAME",
                                     dimension_numbers=DN)
        return jnp.sum(y * jnp.cos(y.astype(jnp.float32)))

    gx_k, gw_k = jax.grad(loss_kernel, (0, 1))(x, wt)
    gx_c, gw_c = jax.grad(loss_conv, (0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_c),
                               atol=3e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_c),
                               atol=3e-3, rtol=1e-3)


def test_bf16_operands():
    """bf16 in/out (the training dtype): kernel tracks the XLA winograd
    expression, which tests/test_winograd.py bounds against the conv."""
    b, h, w, c, k = 4, 16, 16, 256, 256
    x, wt = _data(b, h, w, c, k, seed=3)
    xb, wb = x.astype(jnp.bfloat16), wt.astype(jnp.bfloat16)
    y_kernel = wino_conv2d(xb, wb).astype(np.float32)
    y_wino = winograd3x3(xb, wb).astype(np.float32)
    assert y_kernel.dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(y_kernel), np.asarray(y_wino), atol=3e-2, rtol=3e-2
    )


def test_wgrad_kernel_matches_conv_wgrad():
    """The transform-domain weight-grad kernel (_wino_wgrad) equals the
    XLA conv wgrad to fp32 rounding — the 16-vs-36 MACs/tile contraction
    is the exact adjoint of the winograd forward."""
    from rendernet_tpu.ops import pallas_winograd as pw

    b, h, w, c, k = 4, 8, 8, 256, 256
    x, _ = _data(b, h, w, c, k, seed=4)
    rng = np.random.default_rng(9)
    gy = jnp.asarray(rng.standard_normal((b, h, w, k)).astype(np.float32))

    got = pw._wino_wgrad(x, gy)

    def conv(ww):
        return lax.conv_general_dilated(x, ww, (1, 1), "SAME",
                                        dimension_numbers=DN)

    (want,) = jax.vjp(conv, jnp.zeros((3, 3, c, k), jnp.float32))[1](gy)
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale,
                               atol=2e-6)


def test_bwd_with_wino_wgrad_matches_xla_wgrad_path():
    """WGRAD=True routes the custom-VJP backward through the fused wgrad
    kernel; gradients match the default (XLA-wgrad) path to rounding."""
    from rendernet_tpu.ops import pallas_winograd as pw

    b, h, w, c, k = 2, 8, 8, 256, 256
    x, wt = _data(b, h, w, c, k, seed=5)

    def loss(xx, ww):
        y = wino_conv2d(xx, ww)
        return jnp.sum(y * jnp.cos(y.astype(jnp.float32)))

    gx0, gw0 = jax.grad(loss, (0, 1))(x, wt)
    old = pw.WGRAD
    try:
        pw.WGRAD = True
        assert pw._wgrad_tiles(h, w, b, c, k, 4) is not None
        gx1, gw1 = jax.grad(loss, (0, 1))(x, wt)
    finally:
        pw.WGRAD = old
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                               atol=1e-4, rtol=1e-4)


def test_fp32_wgrad_mode_matches_conv_wgrad_tightly():
    """WGRAD="fp32" (precision=HIGHEST tile contraction) tracks the conv
    wgrad at fp32-rounding tightness — the numerics the quality gate
    demands of the weight gradient."""
    from rendernet_tpu.ops import pallas_winograd as pw

    b, h, w, c, k = 2, 8, 8, 256, 256
    x, wt = _data(b, h, w, c, k, seed=6)

    def loss(xx, ww):
        y = wino_conv2d(xx, ww)
        return jnp.sum(y * jnp.cos(y.astype(jnp.float32)))

    def loss_conv(xx, ww):
        y = lax.conv_general_dilated(xx, ww, (1, 1), "SAME",
                                     dimension_numbers=DN)
        return jnp.sum(y * jnp.cos(y.astype(jnp.float32)))

    _, gw_ref = jax.grad(loss_conv, (0, 1))(x, wt)
    old = pw.WGRAD
    try:
        pw.WGRAD = "fp32"
        _, gw = jax.grad(loss, (0, 1))(x, wt)
    finally:
        pw.WGRAD = old
    # cotangent differs slightly (wino fwd vs conv fwd outputs feed the
    # cos'), so compare at fwd-roundoff tightness rather than exactness
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-3, atol=1e-3)
