"""Compiled-path kernel tests — run manually ON TPU.

The default suite pins CPU (tests/conftest.py) where Pallas runs in
interpret mode; Mosaic-compiled numerics have their own constraints (block
shape rules, lane-gather lowering, scoped VMEM) and deserve a gate on the
real chip. These tests auto-skip off-TPU; run them with:

    JAX_PLATFORMS='' python -m pytest tests/test_tpu_kernels.py -q -m tpu --no-header -p no:cacheprovider

(the conftest CPU pin is bypassed via the RENDERNET_TPU_TESTS env var).
`benchmarks/tpu_kernel_parity.py` remains the scripted equivalent with
timing; these are the pass/fail form.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

if not os.environ.get("RENDERNET_TPU_TESTS"):
    pytest.skip(
        "TPU kernel lane: set RENDERNET_TPU_TESTS=1 and run on a TPU host",
        allow_module_level=True,
    )

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

if jax.default_backend() != "tpu":
    pytest.skip("requires a real TPU backend", allow_module_level=True)

from rendernet_tpu.ops import pallas_conv2d as pc2  # noqa: E402
from rendernet_tpu.ops import pallas_conv3d as pc3  # noqa: E402
from rendernet_tpu.ops import pallas_resample as prs  # noqa: E402
from rendernet_tpu.ops import resample as rs  # noqa: E402


def _rel(got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = float(np.abs(want).max()) or 1.0
    return float(np.abs(got - want).max()) / scale


@pytest.mark.parametrize("b,hw,c", [(24, 32, 1024), (24, 64, 512)])
def test_compiled_wc_conv2d_fwd_bwd(b, hw, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)

    def plain(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    got = jax.jit(pc2.wc_conv2d)(x, w)
    want = jax.jit(plain)(x, w)
    assert _rel(got, want) < 1e-2

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32) ** 2)

    gk = jax.jit(jax.grad(loss(pc2.wc_conv2d), (0, 1)))(x, w)
    gr = jax.jit(jax.grad(loss(plain), (0, 1)))(x, w)
    assert _rel(gk[0], gr[0]) < 2e-2
    assert _rel(gk[1], gr[1]) < 2e-2


def test_compiled_wc_conv2d_fused_epilogues():
    rng = np.random.default_rng(1)
    b, hw, c = 24, 32, 1024
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
    xh = pc2.nhwc_to_hwnc(x)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.bfloat16)
    al = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.bfloat16)

    def ref(x, w, bias, al):
        z = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bias
        return jnp.maximum(z, 0.0) + al * jnp.minimum(z, 0.0)

    got = pc2.hwnc_to_nhwc(jax.jit(pc2.wc_conv2d_prelu_hwnc)(xh, w, bias, al))
    want = jax.jit(ref)(x, w, bias, al)
    assert _rel(got, want) < 1e-2

    def loss_k(xh, w, bias, al):
        return jnp.sum(pc2.wc_conv2d_prelu_hwnc(xh, w, bias, al).astype(jnp.float32) ** 2)

    def loss_r(x, w, bias, al):
        return jnp.sum(ref(x, w, bias, al).astype(jnp.float32) ** 2)

    gk = jax.jit(jax.grad(loss_k, (0, 1, 2, 3)))(xh, w, bias, al)
    gr = jax.jit(jax.grad(loss_r, (0, 1, 2, 3)))(x, w, bias, al)
    assert _rel(pc2.hwnc_to_nhwc(gk[0]), gr[0]) < 2e-2
    for i in (1, 2, 3):
        assert _rel(gk[i], gr[i]) < 2e-2, i


def test_compiled_nc_conv3d_fwd_bwd():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 32, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.05, jnp.bfloat16)

    def plain(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    assert pc3.nc_conv3d_supported(x.shape, w.shape, (1, 1, 1))
    got = jax.jit(pc3.nc_conv3d)(x, w)
    want = jax.jit(plain)(x, w)
    assert _rel(got, want) < 1e-2

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32) ** 2)

    gk = jax.jit(jax.grad(loss(pc3.nc_conv3d), (0, 1)))(x, w)
    gr = jax.jit(jax.grad(loss(plain), (0, 1)))(x, w)
    assert _rel(gk[0], gr[0]) < 2e-2
    assert _rel(gk[1], gr[1]) < 2e-2


def test_compiled_multipass_resample_vs_exact():
    rng = np.random.default_rng(3)
    vox = jnp.asarray(rng.random((4, 64, 64, 64, 1)), jnp.float32)
    poses = jnp.asarray(
        [[0.7, 0.3, 1.0], [2.5, -0.8, 1.1], [4.2, 0.9, 0.9], [5.9, -1.2, 1.0]],
        jnp.float32,
    )
    mp = jax.jit(
        lambda v, p: prs.rotate_resample_to_camera_multipass(v, p, new_size=128)
    )(vox, poses)
    ex = jax.jit(
        lambda v, p: rs.rotate_resample_to_camera(v, p, new_size=128)
    )(vox, poses)
    # mean-level agreement; pointwise max differs on noise input by filter
    # response (documented; see docs/performance.md and the quality A/B)
    assert float(jnp.mean(jnp.abs(mp - ex))) < 0.02
