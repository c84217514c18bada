"""One-configuration probe of the full-512 / patch-64 shader train step.

Unlike bench.py this does NOT ladder down on failure: it builds exactly the
requested configuration and either prints its frames/s or the RAW error —
the tool for attributing memory-lever effects (docs/performance.md).

Env knobs: PATCH (64|128), BATCH, PREACT (0|1), MOMENTS (float32|bfloat16),
REMAT (0|1), REMAT3D, SCAN, ACCUM, PALLAS2D (0|1 — force the fused HWNC
Pallas res stacks), COMPILER_OPTS (JSON dict of XLA compile options, e.g.
'{"xla_jf_rematerialization_percent_shared_memory_limit":"100"}' —
forwarded to the TPU compiler per-compile).
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

    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.steps import (
        create_shader_state,
        make_shader_train_step,
    )

    patch = int(os.environ.get("PATCH", "128"))
    batch = int(os.environ.get("BATCH", "24"))
    if os.environ.get("PALLAS2D") is not None:
        from rendernet_tpu.nn import layers

        layers.PALLAS_CONV2D = bool(int(os.environ["PALLAS2D"]))
    knobs = dict(
        pallas2d=os.environ.get("PALLAS2D", ""),
        preact=bool(int(os.environ.get("PREACT", "0"))),
        moments=os.environ.get("MOMENTS", "float32"),
        remat=bool(int(os.environ.get("REMAT", "0"))),
        remat_3d=bool(int(os.environ.get("REMAT3D", "0"))),
        scan=bool(int(os.environ.get("SCAN", "0"))),
        accum=int(os.environ.get("ACCUM", "1")),
    )
    cfg = TrainConfig(
        batch_size=batch, img_res=512, new_size=128,
        compute_dtype="bfloat16", is_greyscale=True, e_eta=1e-5,
        grad_accum_steps=knobs["accum"], moment_dtype=knobs["moments"],
    )
    model_cfg = ShaderConfig(
        remat=knobs["remat"], remat_3d=knobs["remat_3d"],
        scan_blocks=knobs["scan"], preact_policy=knobs["preact"],
    )
    rng = np.random.default_rng(0)
    state, tx = create_shader_state(jax.random.PRNGKey(0), model_cfg, cfg)
    step = make_shader_train_step(model_cfg, cfg, tx, patch_size=patch)
    voxels = jnp.asarray(
        (rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32)
    )
    images = jnp.asarray(rng.random((batch, 512, 512, 1)).astype(np.float32))
    poses = jnp.asarray(np.stack(
        [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch),
         np.ones(batch)], axis=1).astype(np.float32))
    key = jax.random.PRNGKey(1)
    copts = os.environ.get("COMPILER_OPTS")
    if copts:
        knobs["compiler_opts"] = copts
        step = step.lower(state, voxels, images, poses, key).compile(
            compiler_options=json.loads(copts)
        )
    try:
        state, loss = step(state, voxels, images, poses, key)
        float(loss)
    except Exception as e:
        print(json.dumps({"probe": {"patch": patch, "batch": batch, **knobs},
                          "error": f"{type(e).__name__}: {e}"[:2000]}),
              flush=True)
        return
    n_steps = 8
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state, voxels, images, poses, key)
    float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "probe": {"patch": patch, "batch": batch, **knobs},
        "s_per_step": round(dt / n_steps, 4),
        "frames_per_s": round(batch * n_steps / dt, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
