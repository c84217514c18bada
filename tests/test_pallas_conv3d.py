"""Tests for the implicit-GEMM Pallas 3D conv (ops/pallas_conv3d.py).

On CPU the kernel runs in Pallas interpret mode; the oracle is XLA's plain
stride-1 SAME conv — the kernel is the same math (reference semantics:
tools/layer_util.py:228-267 as used by the res blocks :60-121) with the
depth axis packed into MXU lanes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rendernet_tpu.nn import layers
from rendernet_tpu.nn.layers import Module
from rendernet_tpu.ops.pallas_conv3d import nc_conv3d, nc_conv3d_supported


def plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


@pytest.mark.parametrize(
    "shape,co",
    [
        ((1, 4, 8, 8, 16), 16),  # f=8, nq=1
        ((2, 3, 4, 8, 8), 32),  # f=4, nq=2, ci != co
        ((1, 2, 8, 4, 32), 64),  # f=2, nq=2
    ],
)
def test_nc_conv3d_matches_plain(rng, shape, co):
    ci = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 3, ci, co)) * 0.1).astype(np.float32)
    )
    assert nc_conv3d_supported(x.shape, w.shape, (1, 1, 1))
    np.testing.assert_allclose(
        np.asarray(nc_conv3d(x, w)), np.asarray(plain(x, w)), atol=1e-4
    )


def test_nc_conv3d_grads_match_plain(rng):
    """Custom VJP (data grad via flipped-kernel conv, weight grad via the
    packed-accumulator kernel) equals XLA's autodiff of the plain conv.
    ci=8 != co=16 also exercises the data-grad fallback branch (the adjoint
    conv's co=8 is outside the kernel envelope)."""
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 3, 8, 16)) * 0.1).astype(np.float32)
    )
    gy = jnp.asarray(
        rng.standard_normal((2, 3, 8, 8, 16)).astype(np.float32)
    )

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w) * gy)

    gx_k, gw_k = jax.grad(loss(nc_conv3d), (0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss(plain), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r), atol=1e-4)


def test_nc_conv3d_grads_match_plain_square(rng):
    """ci == co: the data grad takes the in-envelope kernel path."""
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 3, 16, 16)) * 0.1).astype(np.float32)
    )

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w) ** 2)

    gx_k, gw_k = jax.grad(loss(nc_conv3d), (0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss(plain), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r), atol=1e-4)


def test_supported_guards():
    w = (3, 3, 3, 32, 32)
    assert nc_conv3d_supported((2, 4, 8, 8, 32), w, (1, 1, 1))
    # strided / non-3x3x3 / wide-co / indivisible-depth / M misaligned
    assert not nc_conv3d_supported((2, 4, 8, 8, 32), w, (1, 1, 2))
    assert not nc_conv3d_supported((2, 4, 8, 8, 32), (5, 3, 3, 32, 32), (1, 1, 1))
    assert not nc_conv3d_supported((2, 4, 8, 8, 128), (3, 3, 3, 128, 128), (1, 1, 1))
    assert not nc_conv3d_supported((2, 4, 8, 6, 32), w, (1, 1, 1))
    assert not nc_conv3d_supported((2, 4, 3, 4, 32), w, (1, 1, 1))
    assert not nc_conv3d_supported((2, 4, 8, 8), w, (1, 1, 1))


def test_conv3d_dispatch_uses_kernel(rng):
    """conv3d routes eligible shapes through the Pallas kernel when forced
    on, and the layer output still matches the default lowering."""
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 16)).astype(np.float32))
    outs = {}
    mi = Module(rng=jax.random.PRNGKey(3))
    layers.conv3d(mi, x, 16, (3, 3, 3), (1, 1, 1), scope="c")
    for forced in (True, False):
        old = layers.PALLAS_CONV3D
        layers.PALLAS_CONV3D = forced
        try:
            m = Module(params=mi.params)
            outs[forced] = np.asarray(
                layers.conv3d(m, x, 16, (3, 3, 3), (1, 1, 1), scope="c")
            )
        finally:
            layers.PALLAS_CONV3D = old
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-4)
