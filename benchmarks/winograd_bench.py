"""Winograd F(2x2,3x3) vs XLA conv on TPU: isolated op and end-to-end.

The full-512 shader step is conv-schedule-bound with the res-stack convs
at ~93% per-op roofline (docs/performance.md round 4); Winograd's 2.25x
MAC cut is the one remaining lever on that band. This measures:

  1. isolated 3x3 conv at the res2/res3 training shapes — fwd and
     fwd+bwd (the bwd exercises jax-derived Winograd adjoints);
  2. the full-512 train step with layers.WINOGRAD_2D=1 (dispatch covers
     the C>=256 res-stack convs).

One JSON line per measurement. Record to
benchmarks/results/winograd_bench_r4.json if decisive either way.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from rendernet_tpu.ops.pallas_winograd import wino_conv2d
    from rendernet_tpu.ops.winograd import winograd3x3

    rng = np.random.default_rng(0)
    DN = ("NHWC", "HWIO", "NHWC")
    # which impls to time isolated: comma list from env (default all)
    impls = os.environ.get(
        "RENDERNET_BENCH_WINOGRAD_IMPLS", "xla,winograd,pallas"
    ).split(",")

    def xla_conv(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=DN)

    def timeit(fn, args, n=10):
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    # res2 (1024ch @ 64x64, batch 24) and res3 (512ch) training shapes
    for (b, hw, c) in ((24, 64, 1024), (24, 64, 512)):
        x = jnp.asarray(
            rng.standard_normal((b, hw, hw, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            (rng.standard_normal((3, 3, c, c)) * 0.02).astype(np.float32)
        ).astype(jnp.bfloat16)

        for name, fn in (("xla", xla_conv), ("winograd", winograd3x3),
                         ("pallas", wino_conv2d)):
            if name not in impls:
                continue
            jf = jax.jit(fn)
            ms = timeit(jf, (x, w))

            def fb(xx, ww):
                y, vjp = jax.vjp(fn, xx, ww)
                gx, gw = vjp(y)
                return jnp.sum(gx.astype(jnp.float32)) + jnp.sum(
                    gw.astype(jnp.float32))

            ms_fb = timeit(jax.jit(fb), (x, w), n=6)
            print(json.dumps({
                "shape": [b, hw, hw, c], "impl": name,
                "fwd_ms": round(ms, 3), "fwd_bwd_ms": round(ms_fb, 3),
            }), flush=True)

    # end-to-end full-512 step with the dispatch flag on
    # (RENDERNET_BENCH_WINOGRAD=xla|pallas|off selects the impl)
    e2e = os.environ.get("RENDERNET_BENCH_WINOGRAD", "pallas")
    if e2e == "off":
        return
    from rendernet_tpu.nn import layers

    layers.WINOGRAD_2D = e2e
    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.steps import (
        create_shader_state,
        make_shader_train_step,
    )

    batch = int(os.environ.get("RENDERNET_BENCH_BATCH", "24"))
    cfg = TrainConfig(batch_size=batch, img_res=512, new_size=128,
                      compute_dtype="bfloat16", is_greyscale=True,
                      e_eta=1e-5)
    mc = ShaderConfig(
        preact_policy=True,
        remat=bool(int(os.environ.get("RENDERNET_BENCH_REMAT", "0"))),
    )
    state, tx = create_shader_state(jax.random.PRNGKey(0), mc, cfg)
    step = make_shader_train_step(mc, cfg, tx, patch_size=128)
    voxels = jnp.asarray(
        (rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32))
    images = jnp.asarray(
        rng.random((batch, 512, 512, 1)).astype(np.float32))
    poses = jnp.asarray(np.stack(
        [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch),
         np.ones(batch)], axis=1).astype(np.float32))
    key = jax.random.PRNGKey(1)
    try:
        state, loss = step(state, voxels, images, poses, key)
        float(loss)
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = step(state, voxels, images, poses, key)
        float(loss)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "step": "full512_winograd_" + e2e, "s_per_step": round(dt / n, 4),
            "frames_per_s": round(batch * n / dt, 4),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"step": "full512_winograd_" + e2e,
                          "error": str(e)[:400]}), flush=True)


if __name__ == "__main__":
    main()
