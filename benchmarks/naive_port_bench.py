"""Measure the NAIVE XLA port of the reference training step.

This is the honest ``vs_baseline`` denominator for bench.py: what a direct
translation of the TF1 graph (RenderNet_Shader.py:139-173) to JAX costs on
this chip with none of the framework's TPU work — fp32 compute (TF1
default), the exact trilinear gather resample (the literal port of
tf_interpolate's 8 flat gathers, tools/resampling_voxel_grid.py:381-486),
plain XLA convs, same optimizer/loss. Same step builder, so the comparison
isolates exactly the TPU-first engineering (bf16 MXU layouts, multipass
Pallas resample, crop fusion, Pallas conv3d).

Emits one JSON line; record into benchmarks/results/naive_port_r3.json.
OOM fallback: remat, then batch halving — reported in the output.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time


def measure(patch: int, batch: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.nn import layers
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.steps import create_shader_state, make_shader_train_step

    layers.PALLAS_CONV3D = False  # plain XLA convs — the naive port
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    last_err = None
    while True:
        for remat in (False, True):
            try:
                cfg = TrainConfig(
                    batch_size=batch, img_res=512, new_size=128,
                    compute_dtype="float32", resample="exact",
                    is_greyscale=True, e_eta=1e-5,
                )
                model_cfg = ShaderConfig(remat=remat)
                state, tx = create_shader_state(
                    jax.random.PRNGKey(0), model_cfg, cfg
                )
                step = make_shader_train_step(model_cfg, cfg, tx, patch_size=patch)
                voxels = jnp.asarray(
                    (rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32)
                )
                images = jnp.asarray(
                    rng.random((batch, 512, 512, 1)).astype(np.float32)
                )
                poses = jnp.asarray(np.stack(
                    [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch),
                     np.ones(batch)], axis=1).astype(np.float32))
                state, loss = step(state, voxels, images, poses, key)
                float(loss)
                break
            except Exception as e:
                # Only memory exhaustion may degrade the measured config;
                # anything else (compile-server hiccup, bad arg) fails loudly
                # so the committed denominator can't silently record a wrong
                # configuration.
                msg = f"{type(e).__name__}: {e}"
                if not any(pat in msg for pat in (
                    "RESOURCE_EXHAUSTED", "Out of memory", "out of memory",
                    "OOM", "Ran out of memory", "exceeds the limit",
                )):
                    raise
                last_err = msg
                if remat and batch <= 1:
                    raise
        else:
            batch //= 2
            continue
        break
    n_steps = 4
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state, voxels, images, poses, key)
    float(loss)
    dt = time.perf_counter() - t0
    out = {
        "patch": patch,
        "batch": batch,
        "remat": remat,
        "s_per_step": round(dt / n_steps, 4),
        "frames_per_s": round(batch * n_steps / dt, 4),
    }
    if last_err is not None:
        out["fallback_err"] = last_err[:300]  # why remat/batch degraded
    return out


def main():
    import jax

    out = {
        "bench": "naive_xla_port",
        "date": time.strftime("%Y-%m-%d"),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0].device_kind),
        "note": (
            "fp32 + exact-gather resample + plain XLA convs via the same "
            "step builder — the direct port of the reference graph; the "
            "vs_baseline denominator for bench.py"
        ),
        "full512": measure(128, 24),
        "patch64": measure(64, 24),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
