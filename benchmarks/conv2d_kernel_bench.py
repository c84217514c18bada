"""Pallas wc_conv2d vs XLA on the shader net's hot 2D conv shapes (TPU).

One JSON line per measurement. Also times the full shader network fwd+bwd
at the training patch size with the kernel on vs off — the end-to-end
number that decides the default dispatch.

Usage: python benchmarks/conv2d_kernel_bench.py [--sweep] [--patch N]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sweep: bool = False, batch: int = 24, patch: int = 64):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from rendernet_tpu.nn import layers
    from rendernet_tpu.ops import pallas_conv2d

    rng = np.random.default_rng(0)

    def sync(x):
        if isinstance(x, tuple):
            x = x[0]
        return float(jnp.sum(x.astype(jnp.float32)))

    def measure(name, fn, args, flops, n=6):
        jitted = jax.jit(fn)
        sync(jitted(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = jitted(*args)
        sync(out)
        ms = (time.perf_counter() - t0) / n * 1000
        print(
            json.dumps(
                {"bench": name, "ms": round(ms, 3),
                 "tf_per_s": round(flops / (ms / 1000) / 1e12, 1)}
            ),
            flush=True,
        )
        return ms

    def xla_conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    shapes = [(1024, 32), (512, 32), (1024, 64)]
    for c, hw in shapes:
        x = jnp.asarray(
            rng.standard_normal((batch, hw, hw, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        xh = pallas_conv2d.nhwc_to_hwnc(x)
        w = jnp.asarray(
            (rng.standard_normal((3, 3, c, c)) * 0.02).astype(np.float32)
        ).astype(jnp.bfloat16)
        flops = 2 * batch * hw * hw * 9 * c * c

        measure(f"pallas_wc2d_{c}ch_{hw}sp_fwd",
                pallas_conv2d.wc_conv2d_hwnc, (xh, w), flops)

        def fwd_bwd(fn, nargs=2):
            def f(*a):
                return jnp.sum(fn(*a).astype(jnp.float32) ** 2)
            return lambda *a: jax.grad(f, argnums=tuple(range(nargs)))(*a)

        measure(f"pallas_wc2d_{c}ch_{hw}sp_fwd_bwd",
                fwd_bwd(pallas_conv2d.wc_conv2d_hwnc), (xh, w), 3 * flops)

        # Fused conv+bias+PReLU epilogue vs XLA's epilogue-fused conv
        # (the measured ~2x-slow case that motivated the fusion).
        bias = jnp.asarray(
            (rng.standard_normal(c) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)
        alpha = jnp.asarray(
            (rng.standard_normal(c) * 0.3).astype(np.float32)
        ).astype(jnp.bfloat16)

        def xla_prelu(x, w, b, al):
            z = xla_conv(x, w) + b
            return jnp.maximum(z, 0.0) + al * jnp.minimum(z, 0.0)

        measure(f"xla_conv_prelu_{c}ch_{hw}sp_fwd",
                xla_prelu, (x, w, bias, alpha), flops)
        measure(f"pallas_wc2d_prelu_{c}ch_{hw}sp_fwd",
                pallas_conv2d.wc_conv2d_prelu_hwnc, (xh, w, bias, alpha),
                flops)
        measure(f"xla_conv_prelu_{c}ch_{hw}sp_fwd_bwd",
                fwd_bwd(xla_prelu, 4), (x, w, bias, alpha), 3 * flops)
        measure(f"pallas_wc2d_prelu_{c}ch_{hw}sp_fwd_bwd",
                fwd_bwd(pallas_conv2d.wc_conv2d_prelu_hwnc, 4),
                (xh, w, bias, alpha), 3 * flops)
        measure(f"pallas_wc2d_res_{c}ch_{hw}sp_fwd_bwd",
                fwd_bwd(pallas_conv2d.wc_conv2d_res_hwnc, 4),
                (xh, w, bias, xh), 3 * flops)

        if sweep:
            h = hw
            cands = []
            for bn in (256, 128):
                for bh in (8, 4, 2):
                    for bb in (24, 16, 8):
                        if batch % bb or h % bh or c % bn:
                            continue
                        if not pallas_conv2d._bb_ok(bb, batch):
                            continue
                        if hw * bb > 512 or (hw * bb) % 8:
                            continue
                        if pallas_conv2d._vmem_bytes(
                            bh, bb, bn, hw, c, 2
                        ) > pallas_conv2d._VMEM_BUDGET:
                            continue
                        cands.append((bn, bh, bb))
            for tile in cands:
                pallas_conv2d.TILE_OVERRIDE = tile
                # TILE_OVERRIDE is read at trace time; the trace cache is
                # keyed on function identity + shapes and would silently
                # reuse the previous tile's executable.
                jax.clear_caches()
                try:
                    measure(
                        f"pallas_wc2d_{c}ch_{hw}sp_fwd_tile{tile}",
                        pallas_conv2d.wc_conv2d_hwnc, (xh, w), flops, n=3,
                    )
                except Exception as e:  # noqa: BLE001 - sweep robustness
                    print(json.dumps(
                        {"bench": f"tile{tile}", "error": str(e)[:120]}),
                        flush=True)
                finally:
                    pallas_conv2d.TILE_OVERRIDE = None

    # End-to-end: shader network fwd+bwd at training patch, kernel on/off.
    from rendernet_tpu.models.shader import (
        ShaderConfig, init_shader_params, shader_rendernet,
    )
    from rendernet_tpu.nn.layers import Module

    cfg = ShaderConfig()
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    vox_patch = jnp.asarray(
        rng.random((batch, patch, patch, 128, 1)).astype(np.float32)
    )

    def net(p, x):
        m = Module(params=p, compute_dtype=jnp.bfloat16)
        return shader_rendernet(m, x.astype(jnp.bfloat16), cfg)

    # The output must consume EVERY gradient (params AND input): returning
    # a single grad leaf lets XLA dead-code-eliminate most of the backward
    # pass (a round-1 bug that made this number look 3x faster than the
    # step it was meant to explain).
    def gnet(p, x):
        gp, gx = jax.grad(
            lambda p, x: jnp.sum(net(p, x).astype(jnp.float32) ** 2),
            argnums=(0, 1),
        )(p, x)
        tot = jnp.sum(gx.astype(jnp.float32))
        for leaf in jax.tree.leaves(gp):
            tot += jnp.sum(leaf.astype(jnp.float32))
        return tot

    for forced in (True, False):
        layers.PALLAS_CONV2D = forced
        measure(
            f"network_fwd_bwd_patch{patch}_wc2d_{'on' if forced else 'off'}",
            gnet,
            (params, vox_patch),
            0.0 or 1,  # TF/s not meaningful here
            n=4,
        )


if __name__ == "__main__":
    _patch = 64
    if "--patch" in sys.argv:
        _patch = int(sys.argv[sys.argv.index("--patch") + 1])
    main(sweep="--sweep" in sys.argv, patch=_patch)
