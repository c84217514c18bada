"""Inference/serving benchmark: the deployed render path on TPU.

The reference's deployment story is a frozen .pb consumed by
RenderNet_demo.py (demo/RenderNet_converter.py); ours is a StableHLO
artifact (compat/frozen.py) or the live jitted pipeline. This measures
what a serving user sees:

  * single-request latency (batch 1, voxel -> 512px normal map/image,
    exact-resample parity path AND the fast multipass path);
  * batched throughput (frames/s at batch 8/24/48, fwd only);
  * the full demo composite (render + on-device Phong) latency.

One JSON line per measurement. Timing uses a chained-steps + one host
fetch discipline (see docs/performance.md).

Usage: python benchmarks/serving_bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("RENDERNET_BENCH_PALLAS2D") is not None:
        from rendernet_tpu.nn import layers

        layers.PALLAS_CONV2D = bool(
            int(os.environ["RENDERNET_BENCH_PALLAS2D"])
        )
    # Winograd is a legitimate SERVING lever even though it failed the
    # TRAINING quality gate (winograd_quality_ab_r5.json): inference
    # through fixed trained weights sees only the bounded ~0.5% per-op
    # forward rounding, no compounding. "pallas" | "xla" | unset=off.
    if os.environ.get("RENDERNET_BENCH_WINOGRAD") in ("pallas", "xla"):
        from rendernet_tpu.nn import layers

        layers.WINOGRAD_2D = os.environ["RENDERNET_BENCH_WINOGRAD"]

    from rendernet_tpu.models.shader import (
        ShaderConfig,
        init_shader_params,
        shader_forward,
    )
    from rendernet_tpu.ops.phong import generate_light_pos, phong_composite

    cfg = ShaderConfig()
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def measure(name, fn, args, n=8):
        jitted = jax.jit(fn)
        out = jitted(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = jitted(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / n * 1000
        batch = args[1].shape[0]
        print(
            json.dumps(
                {"bench": name, "ms": round(ms, 2),
                 "frames_per_s": round(batch / (ms / 1000), 1)}
            ),
            flush=True,
        )

    def make_inputs(batch):
        vox = jnp.asarray(
            (rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32)
        )
        pose = jnp.asarray(
            np.stack(
                [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch),
                 np.ones(batch)],
                axis=1,
            ).astype(np.float32)
        )
        return vox, pose

    def render(method):
        def f(p, vox, pose):
            return shader_forward(
                p, vox, pose, cfg, compute_dtype=jnp.bfloat16, resample=method
            )
        return f

    # single-request latency, both warp paths
    vox1, pose1 = make_inputs(1)
    measure("render_latency_b1_multipass", render("multipass"),
            (params, vox1, pose1))
    measure("render_latency_b1_exact", render("exact"), (params, vox1, pose1))

    # batched throughput (the serving-fleet number)
    for b in (8, 24, 48):
        voxb, poseb = make_inputs(b)
        measure(f"render_throughput_b{b}_multipass", render("multipass"),
                (params, voxb, poseb), n=6)

    # full demo composite: render -> Phong shading on device
    def demo(p, vox, pose, light_az):
        normal = shader_forward(
            p, vox, pose, cfg, compute_dtype=jnp.bfloat16,
            resample="multipass",
        )
        b = vox.shape[0]
        nrm3 = jnp.tile(normal, (1, 1, 1, 3)) if normal.shape[-1] == 1 else normal
        light_dir = generate_light_pos(light_az, 0.9, b)
        light_col = jnp.ones((b, 3), jnp.float32)
        shading = phong_composite(
            nrm3, light_dir, light_col, 0.1, 0.9,
            black_background=False, with_mask=True,
        )
        return shading

    light = jnp.full((1, 1), 4.0, jnp.float32)
    measure("demo_composite_latency_b1",
            lambda p, v, q: demo(p, v, q, light), (params, vox1, pose1))


if __name__ == "__main__":
    main()
