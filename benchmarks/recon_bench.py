"""Inverse-rendering inner-step benchmark (one JSON line per measurement).

Times one SGD step of the reconstruction pipeline (5 pose hypotheses,
full 512px composite) at fp32 and bf16 compute — the number PARITY.md's
"inverse-rendering inner step" row reports. Run detached on TPU:

    nohup python benchmarks/recon_bench.py > /tmp/recon_bench.log 2>&1 &
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

    from rendernet_tpu.models.decoders import (
        init_recon_rendernet_params,
        init_recon_texture_decoder_params,
        init_shape_decoder_params,
    )
    from rendernet_tpu.recon.inverse import (
        ReconConfig,
        ReconModel,
        initial_latents,
        make_recon_step,
    )

    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((5, 512, 512, 3)).astype(np.float32))

    for cdt in ("float32", "bfloat16"):
        cfg = ReconConfig(compute_dtype=cdt)
        model = ReconModel(
            decoder=init_shape_decoder_params(jax.random.PRNGKey(0), z_dim=cfg.z_dim),
            texture=init_recon_texture_decoder_params(jax.random.PRNGKey(1)),
            renderer=init_recon_rendernet_params(jax.random.PRNGKey(2)),
        )
        step = make_recon_step(model, cfg)  # already jitted inside
        latents = initial_latents(cfg)
        latents, loss = step(latents, target)  # compile + warm
        float(jnp.sum(loss))
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            latents, loss = step(latents, target)
        float(jnp.sum(loss))
        ms = (time.perf_counter() - t0) / n * 1000
        print(json.dumps({"bench": f"recon_inner_step_{cdt}", "ms": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
