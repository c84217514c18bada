"""Tiling sweep for the fused Winograd kernel (TILE_OVERRIDE hook).

The first-cut kernel ships the first (bn, bb, th) that fits the VMEM
model (ops/pallas_winograd.py:_tiles — bn=512, bb=8, th=1 at the res2
shape). ROADMAP names bn=512/th=2 and larger bb as the obvious
candidates: th=2 halves U re-DMAs per tile-row pair, bigger bb deepens
the GEMM M dim. This measures the isolated kernel fwd and fwd+bwd for
every fitting variant at the training shapes, plus the XLA conv
reference. One JSON line per measurement; timing = chained calls + one
host fetch (docs/performance.md discipline).

Usage (TPU): python benchmarks/winograd_tile_sweep.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.ops import pallas_winograd as pw

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    results = []

    def timeit(fn, *args, n=10):
        # warm by HOST FETCH, not block_until_ready — the tunneled
        # platform's block_until_ready has returned early here, letting
        # the multi-second remote program load bleed into the timed loop
        # (first sweep's xla fwd columns were contaminated exactly so).
        out = fn(*args)  # compile + warm
        for leaf in jax.tree.leaves(out):
            float(jnp.sum(leaf.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        # host fetch forces the chain
        float(jnp.sum(jax.tree.leaves(out)[0][0, 0]))
        return (time.perf_counter() - t0) / n * 1000

    for b, hw, c in ((24, 64, 1024), (24, 32, 1024), (24, 64, 512)):
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)
        gy = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)

        from jax import lax

        conv = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        ms_conv = timeit(conv, x, w)

        def fwdbwd(fn):
            def f(x, w, gy):
                out, vjp = jax.vjp(fn, x, w)
                return vjp(gy)
            return jax.jit(f)

        ms_conv_fb = timeit(fwdbwd(lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))), x, w, gy)

        # candidate tilings that fit the VMEM model
        cands = []
        for bn in (512, 256, 128):
            if c % bn:
                continue
            for bb in (8, 16, 24):
                if b % bb and bb != b:
                    continue
                if bb % 8 and bb != b:
                    continue
                for th in (1, 2, 4):
                    if (hw // 2) % th:
                        continue
                    if pw._vmem_bytes(hw // 2, bb, c, bn, th, 2) \
                            <= pw._VMEM_LIMIT // 2:
                        cands.append((bn, bb, th))
        default = pw._tiles(hw, hw, b, c, c, 2)
        for tiles in cands:
            pw.TILE_OVERRIDE = tiles
            try:
                ms_f = timeit(jax.jit(pw.wino_conv2d), x, w)
                ms_fb = timeit(fwdbwd(pw.wino_conv2d), x, w, gy)
                err = ""
            except Exception as e:  # over-VMEM compile reject etc.
                ms_f = ms_fb = None
                err = f"{type(e).__name__}: {str(e)[:80]}"
            finally:
                pw.TILE_OVERRIDE = None
            rec = {
                "shape": [b, hw, hw, c],
                "tiles_bn_bb_th": list(tiles),
                "is_default": list(tiles) == list(default),
                "fwd_ms": None if ms_f is None else round(ms_f, 3),
                "fwdbwd_ms": None if ms_fb is None else round(ms_fb, 3),
                "xla_conv_fwd_ms": round(ms_conv, 3),
                "xla_conv_fwdbwd_ms": round(ms_conv_fb, 3),
                "error": err,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    # isolated wgrad A/B at the res shapes: fused transform-domain kernel
    # vs XLA's conv wgrad
    from jax import lax

    for b, hw, c in ((24, 64, 1024), (24, 32, 1024), (24, 64, 512)):
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        gy = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        w0 = jnp.zeros((3, 3, c, c), jnp.bfloat16)

        def xla_wgrad(x, gy):
            def conv(ww):
                return lax.conv_general_dilated(
                    x, ww, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            (gw,) = jax.vjp(conv, w0)[1](gy)
            return gw

        try:
            ms_x = timeit(jax.jit(xla_wgrad), x, gy)
            ms_w = timeit(jax.jit(pw._wino_wgrad), x, gy)
            err = ""
        except Exception as e:
            ms_x = ms_w = None
            err = f"{type(e).__name__}: {str(e)[:80]}"
        rec = {"wgrad_shape": [b, hw, hw, c],
               "xla_wgrad_ms": None if ms_x is None else round(ms_x, 3),
               "wino_wgrad_ms": None if ms_w is None else round(ms_w, 3),
               "error": err}
        print(json.dumps(rec), flush=True)

    best = {}
    for r in results:
        if r["fwd_ms"] is None:
            continue
        k = tuple(r["shape"])
        if k not in best or r["fwdbwd_ms"] < best[k]["fwdbwd_ms"]:
            best[k] = r
    print(json.dumps({"best_per_shape": {
        str(k): {"tiles": v["tiles_bn_bb_th"], "fwd_ms": v["fwd_ms"],
                 "fwdbwd_ms": v["fwdbwd_ms"], "default": v["is_default"]}
        for k, v in best.items()
    }}), flush=True)


if __name__ == "__main__":
    main()
