"""Tests for the implicit-GEMM Pallas 2D conv (ops/pallas_conv2d.py).

On CPU the kernel runs in Pallas interpret mode; the oracle is XLA's plain
stride-1 SAME conv (reference semantics: tools/layer_util.py:147-185 as used
by res_block_2d :91-121).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rendernet_tpu.nn import layers
from rendernet_tpu.nn.layers import Module
from rendernet_tpu.ops.pallas_conv2d import (
    wc_conv2d,
    wc_conv2d_supported,
)


def plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize(
    "shape,co",
    [
        ((2, 4, 8, 256), 128),  # bn=128, ci != co
        ((1, 2, 8, 256), 256),  # bn=256 path
        ((3, 4, 16, 384), 128),  # odd-ish batch, W=16
    ],
)
def test_wc_conv2d_matches_plain(rng, shape, co):
    ci = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, ci, co)) * 0.05).astype(np.float32)
    )
    assert wc_conv2d_supported(x.shape, w.shape, (1, 1))
    np.testing.assert_allclose(
        np.asarray(wc_conv2d(x, w)), np.asarray(plain(x, w)), atol=1e-4
    )


def test_wc_conv2d_grads_match_plain(rng):
    """Custom VJP (data grad via flipped-kernel conv, weight grad via the
    pinned-accumulator kernel) equals XLA's autodiff of the plain conv,
    including ci != co (the adjoint conv swaps them)."""
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 256)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 256, 128)) * 0.05).astype(np.float32)
    )
    gy = jnp.asarray(rng.standard_normal((2, 4, 8, 128)).astype(np.float32))

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w) * gy)

    gx_k, gw_k = jax.grad(loss(wc_conv2d), (0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss(plain), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r), atol=1e-4)


def test_supported_guards():
    w = (3, 3, 256, 256)
    assert wc_conv2d_supported((2, 4, 8, 256), w, (1, 1))
    # strided / non-3x3 / narrow or unaligned channels / rank
    assert not wc_conv2d_supported((2, 4, 8, 256), w, (2, 1))
    assert not wc_conv2d_supported((2, 4, 8, 256), (5, 5, 256, 256), (1, 1))
    assert not wc_conv2d_supported((2, 4, 8, 128), (3, 3, 128, 128), (1, 1))
    assert not wc_conv2d_supported((2, 4, 8, 192), (3, 3, 192, 256), (1, 1))
    assert not wc_conv2d_supported((2, 4, 8), w, (1, 1))


def test_conv2d_dispatch_uses_kernel(rng):
    """conv2d routes eligible shapes through the Pallas kernel when forced
    on, and the layer output still matches the default lowering."""
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 256)).astype(np.float32))
    outs = {}
    mi = Module(rng=jax.random.PRNGKey(3))
    layers.conv2d(mi, x, 256, (3, 3), (1, 1), scope="c")
    for forced in (True, False):
        old = layers.PALLAS_CONV2D
        layers.PALLAS_CONV2D = forced
        try:
            m = Module(params=mi.params)
            outs[forced] = np.asarray(
                layers.conv2d(m, x, 256, (3, 3), (1, 1), scope="c")
            )
        finally:
            layers.PALLAS_CONV2D = old
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-4)


@pytest.mark.parametrize("use_scan", [False, True])
def test_res_stack_hwnc_matches_reference_path(rng, use_scan):
    """The HWNC-resident stack (one transpose pair, Pallas convs, scan or
    unrolled) matches the plain res_block_2d loop bit-for-bit in fp32."""
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 256)).astype(np.float32))
    mi = Module(rng=jax.random.PRNGKey(0))
    layers.res_block_stack(mi, x, 3, 256, "blk_{}", ndim=2)
    outs = {}
    for forced in (True, False):
        old = layers.PALLAS_CONV2D
        layers.PALLAS_CONV2D = forced
        try:
            m = Module(params=mi.params)
            outs[forced] = np.asarray(
                layers.res_block_stack(
                    m, x, 3, 256, "blk_{}", ndim=2, use_scan=use_scan
                )
            )
        finally:
            layers.PALLAS_CONV2D = old
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-4)


def test_res_stack_hwnc_grads(rng):
    """Gradients through the HWNC stack match the reference path for both
    params and input."""
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 256)).astype(np.float32))
    mi = Module(rng=jax.random.PRNGKey(1))
    layers.res_block_stack(mi, x, 2, 256, "blk_{}", ndim=2)
    params = mi.params

    def loss(params, x, forced):
        old = layers.PALLAS_CONV2D
        layers.PALLAS_CONV2D = forced
        try:
            m = Module(params=params)
            y = layers.res_block_stack(m, x, 2, 256, "blk_{}", ndim=2)
        finally:
            layers.PALLAS_CONV2D = old
        return jnp.sum(y**2)

    gp_k, gx_k = jax.grad(lambda p, x: loss(p, x, True), (0, 1))(params, x)
    gp_r, gx_r = jax.grad(lambda p, x: loss(p, x, False), (0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=2e-4)
    for k in gp_r:
        np.testing.assert_allclose(
            np.asarray(gp_k[k]), np.asarray(gp_r[k]), atol=2e-4, err_msg=k
        )


def _ref_prelu(x, w, b, al):
    z = plain(x, w) + b
    return jnp.maximum(z, 0.0) + al * jnp.minimum(z, 0.0)


def _ref_relu(x, w, b):
    return jnp.maximum(plain(x, w) + b, 0.0)


def _ref_res(x, w, b, r):
    return plain(x, w) + b + r


def _hwnc(fn):
    """Adapt an HWNC-layout kernel op to NHWC arguments (x and, for the
    residual variant, the 4th arg)."""
    from rendernet_tpu.ops import pallas_conv2d as pc

    def f(x, *rest):
        rest = list(rest)
        if len(rest) == 3 and rest[2].ndim == 4:  # residual input
            rest[2] = pc.nhwc_to_hwnc(rest[2])
        return pc.hwnc_to_nhwc(fn(pc.nhwc_to_hwnc(x), *rest))

    return f


@pytest.mark.parametrize("variant", ["prelu", "relu", "res"])
def test_wc_conv2d_fused_epilogues_match_reference(rng, variant):
    """The fused-epilogue kernels (bias + PReLU/ReLU / residual skip-add in
    the accumulator) match the unfused XLA composition, values and all
    gradients (incl. bias/alpha/residual)."""
    from rendernet_tpu.ops import pallas_conv2d as pc

    ci, co = 256, 256
    x = jnp.asarray(rng.standard_normal((2, 4, 8, ci)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, ci, co)) * 0.05).astype(np.float32)
    )
    b = jnp.asarray(rng.standard_normal(co).astype(np.float32) * 0.1)
    gy = jnp.asarray(rng.standard_normal((2, 4, 8, co)).astype(np.float32))
    if variant == "prelu":
        al = jnp.asarray(rng.standard_normal(co).astype(np.float32) * 0.3)
        args = (x, w, b, al)
        kfn, rfn = _hwnc(pc.wc_conv2d_prelu_hwnc), _ref_prelu
    elif variant == "relu":
        args = (x, w, b)
        kfn, rfn = _hwnc(pc.wc_conv2d_relu_hwnc), _ref_relu
    else:
        r = jnp.asarray(rng.standard_normal((2, 4, 8, co)).astype(np.float32))
        args = (x, w, b, r)
        kfn, rfn = _hwnc(pc.wc_conv2d_res_hwnc), _ref_res

    np.testing.assert_allclose(
        np.asarray(kfn(*args)), np.asarray(rfn(*args)), atol=2e-4
    )

    argnums = tuple(range(len(args)))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * gy)

    gk = jax.grad(loss(kfn), argnums)(*args)
    gr = jax.grad(loss(rfn), argnums)(*args)
    for i, (a, b_) in enumerate(zip(gk, gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-3, err_msg=f"arg {i}"
        )


def test_wc_conv2d_production_tiling_class(rng):
    """(2, 64, 8, 256) selects (bn=256, bh=8) — the same tile class the
    training shapes pick on TPU (bh=8 row blocks, 256-wide weight tiles) —
    so the multi-row kernel path is covered on CPU, values and grads."""
    from rendernet_tpu.ops.pallas_conv2d import _tiles

    x = jnp.asarray(rng.standard_normal((2, 64, 8, 256)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 256, 256)) * 0.05).astype(np.float32)
    )
    assert _tiles(64, 8, 2, 256, 256, 4) == (256, 8, 2)
    np.testing.assert_allclose(
        np.asarray(wc_conv2d(x, w)), np.asarray(plain(x, w)), atol=2e-4
    )
    gy = jnp.asarray(rng.standard_normal((2, 64, 8, 256)).astype(np.float32))

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w) * gy)

    gx_k, gw_k = jax.grad(loss(wc_conv2d), (0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss(plain), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r), atol=2e-3)


def test_prelu_recompute_vjp_matches_save_pre(rng):
    """PRELU_SAVE_PRE=False (backward recomputes the pre-activation with a
    plain conv+bias kernel call) must produce bit-identical gradients to
    the default save-pre VJP for every argument."""
    from rendernet_tpu.ops import pallas_conv2d as pc

    xh = jnp.asarray(
        rng.standard_normal((8, 8, 6, 128)).astype(np.float32)
    )  # HWNC
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 128, 128)) * 0.05).astype(np.float32)
    )
    b = jnp.asarray((rng.standard_normal(128) * 0.1).astype(np.float32))
    al = jnp.asarray((rng.standard_normal(128) * 0.2).astype(np.float32))

    def loss(xh, w, b, al):
        return jnp.sum(jnp.sin(pc.wc_conv2d_prelu_hwnc(xh, w, b, al)))

    try:
        pc.PRELU_SAVE_PRE = True
        g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(xh, w, b, al)
        pc.PRELU_SAVE_PRE = False
        g2 = jax.grad(loss, argnums=(0, 1, 2, 3))(xh, w, b, al)
    finally:
        pc.PRELU_SAVE_PRE = True
    for a, c, nm in zip(g1, g2, ("x", "w", "b", "alpha")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c), err_msg=nm)
