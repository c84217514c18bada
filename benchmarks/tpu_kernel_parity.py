"""On-device numeric parity for the Pallas kernels (run manually on TPU).

The test suite validates every kernel in interpret mode on CPU; this script
re-checks the Mosaic-compiled paths against XLA on the real chip — layout
rules differ between interpret and compiled modes (e.g. the block-shape
divisibility constraint that interpret mode does not enforce), so compiled
numerics deserve their own gate. One JSON line per check.

Usage: python benchmarks/tpu_kernel_parity.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check(name, got, want, tol):
    import numpy as np

    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = float(np.abs(want).max()) or 1.0
    err = float(np.abs(got - want).max()) / scale
    print(json.dumps({"check": name, "rel_err": round(err, 8), "ok": err < tol}),
          flush=True)
    return err < tol


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from rendernet_tpu.ops import pallas_conv2d as pc2
    from rendernet_tpu.ops import pallas_conv3d as pc3
    from rendernet_tpu.ops import resample as rs
    from rendernet_tpu.ops import pallas_resample as prs

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    ok = True

    # --- conv2d implicit GEMM: every production tiling class -------------
    for b, hw, c in ((24, 32, 1024), (24, 64, 512), (8, 64, 1024)):
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)
        assert pc2.wc_conv2d_supported(x.shape, w.shape, (1, 1))

        ref = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32))(x, w)
        got = jax.jit(pc2.wc_conv2d)(x, w)
        ok &= check(f"conv2d_fwd_b{b}_hw{hw}_c{c}", got, ref, 2e-2)

        def loss(fn):
            return jax.jit(jax.grad(
                lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32) ** 2),
                argnums=(0, 1)))

        def xla2d(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        gx, gw = loss(pc2.wc_conv2d)(x, w)
        rx, rw = loss(xla2d)(x, w)
        ok &= check(f"conv2d_gx_b{b}_hw{hw}_c{c}", gx, rx, 4e-2)
        ok &= check(f"conv2d_gw_b{b}_hw{hw}_c{c}", gw, rw, 4e-2)

    # --- conv3d implicit GEMM at the training shape -----------------------
    x3 = jnp.asarray(rng.standard_normal((4, 32, 32, 32, 32)), jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.05, jnp.bfloat16)
    if pc3.nc_conv3d_supported(x3.shape, w3.shape, (1, 1, 1)):
        ref3 = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32))(x3, w3)
        got3 = jax.jit(pc3.nc_conv3d)(x3, w3)
        ok &= check("conv3d_fwd_b4_32cube_32ch", got3, ref3, 2e-2)

    # --- fused winograd vs XLA conv (fwd + gx; gw is XLA's in both) ------
    # Per-op bound only: ~1.7x the conv's bf16 rounding (0.005 vs 0.003
    # max-rel at these shapes). The TRAINING-quality consequence of that
    # amplification is a measured FAIL (winograd_quality_ab_r5.json).
    from rendernet_tpu.ops import pallas_winograd as pwg

    for b, hw, c in ((8, 64, 1024), (8, 64, 512)):
        xw = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        ww = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02,
                         jnp.bfloat16)
        assert pwg.wino_conv2d_supported(xw.shape, ww.shape, (1, 1),
                                         dtype=xw.dtype)
        refw = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32))(xw, ww)
        gotw = jax.jit(pwg.wino_conv2d)(xw, ww)
        ok &= check(f"winograd_fwd_b{b}_hw{hw}_c{c}", gotw, refw, 2e-2)

        def loss_w(fn):
            return jax.jit(jax.grad(
                lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32) ** 2),
                argnums=(0, 1)))

        def xla2dw(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        gxw, gww = loss_w(pwg.wino_conv2d)(xw, ww)
        rxw, rww = loss_w(xla2dw)(xw, ww)
        ok &= check(f"winograd_gx_b{b}_hw{hw}_c{c}", gxw, rxw, 4e-2)
        ok &= check(f"winograd_gw_b{b}_hw{hw}_c{c}", gww, rww, 4e-2)

        # fused transform-domain wgrad (WGRAD=True path) vs the same ref
        old_wgrad = pwg.WGRAD
        try:
            pwg.WGRAD = True
            _, gww2 = loss_w(pwg.wino_conv2d)(xw, ww)
        finally:
            pwg.WGRAD = old_wgrad
        ok &= check(f"winograd_fused_wgrad_b{b}_hw{hw}_c{c}", gww2, rww, 4e-2)

    # --- multipass resample vs exact trilinear ----------------------------
    vox = jnp.asarray((rng.random((2, 64, 64, 64, 1)) > 0.7), jnp.float32)
    pose = jnp.asarray(
        np.stack([rng.uniform(0, 6.28, 2), rng.uniform(-1, 1, 2),
                  np.ones(2)], axis=1), jnp.float32)
    exact = jax.jit(lambda v, p: rs.rotate_resample(v, p, new_size=128))(
        vox, pose)
    fast = jax.jit(lambda v, p: prs.rotate_resample_multipass(
        v, p, new_size=128))(vox, pose)
    # Different reconstruction filters — compare loosely (mean abs).
    d = float(jnp.mean(jnp.abs(exact - fast)))
    print(json.dumps({"check": "resample_multipass_vs_exact_meanabs",
                      "mean_abs": round(d, 6), "ok": d < 0.02}), flush=True)
    ok &= d < 0.02

    print(json.dumps({"all_ok": bool(ok)}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
