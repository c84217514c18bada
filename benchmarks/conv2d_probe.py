"""Probe: XLA's achieved throughput on the wide-channel 2D res-stack convs.

The shader net's FLOPs live in the post-projection 2D res stacks
(RenderNet_Shader.py:71-99 — 10 blocks at depth*32 channels, 5 at 512).
This measures what XLA:TPU achieves on those exact conv shapes (fwd and
fwd+bwd) so we know the headroom a hand-written Pallas implicit-GEMM
kernel could claim. One JSON line per measurement with achieved TF/s.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch: int = 24):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.default_rng(0)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def measure(name, fn, args, flops, n=6):
        jitted = jax.jit(fn)
        out = jitted(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # warm
        t0 = time.perf_counter()
        for _ in range(n):
            out = jitted(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ms = (time.perf_counter() - t0) / n * 1000
        print(
            json.dumps(
                {
                    "bench": name,
                    "ms": round(ms, 3),
                    "tf_per_s": round(flops / (ms / 1000) / 1e12, 1),
                }
            ),
            flush=True,
        )

    for c, hw in ((1024, 32), (512, 32), (1024, 64)):
        x = jnp.asarray(
            rng.standard_normal((batch, hw, hw, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            (rng.standard_normal((3, 3, c, c)) * 0.02).astype(np.float32)
        ).astype(jnp.bfloat16)
        flops = 2 * batch * hw * hw * 9 * c * c
        measure(f"xla_conv2d_{c}ch_{hw}sp_fwd", conv, (x, w), flops)

        def fwd_bwd(x, w):
            def f(x, w):
                return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)

            return jax.grad(f, argnums=(0, 1))(x, w)

        measure(
            f"xla_conv2d_{c}ch_{hw}sp_fwd_bwd", fwd_bwd, (x, w), 3 * flops
        )


if __name__ == "__main__":
    main()
