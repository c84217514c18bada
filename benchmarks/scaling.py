"""Data-parallel scaling-efficiency benchmark.

Measures shader train-step throughput at 1, 2, 4, ... devices over the
('data','model') mesh and reports frames/s per device and scaling
efficiency. On real multi-chip hardware this exercises ICI collectives; on a
CPU host it runs against virtual devices (set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``)
to validate the sharded program, with timings indicative only.

Prints one JSON line per device count.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_devices: int, per_device_batch: int = 4, img_res: int = 256,
            new_size: int = 64, steps: int = 5) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.distributed import make_mesh, replicate, shard_batch
    from rendernet_tpu.train.steps import create_shader_state, make_shader_train_step

    batch = n_devices * per_device_batch
    cfg = TrainConfig(
        batch_size=batch, img_res=img_res, new_size=new_size,
        compute_dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
        is_greyscale=True, e_eta=1e-5,
    )
    model_cfg = ShaderConfig(new_size=new_size)
    state, tx = create_shader_state(jax.random.PRNGKey(0), model_cfg, cfg)
    mesh = make_mesh(n_data=n_devices, devices=jax.devices()[:n_devices])
    state = replicate(mesh, state)
    step = make_shader_train_step(model_cfg, cfg, tx, patch_size=new_size // 2)

    rng = np.random.default_rng(0)
    data = shard_batch(
        mesh,
        (
            jnp.asarray((rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32)),
            jnp.asarray(rng.random((batch, img_res, img_res, 1)).astype(np.float32)),
            jnp.asarray(
                np.stack(
                    [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch),
                     np.ones(batch)],
                    axis=1,
                ).astype(np.float32)
            ),
        ),
    )
    key = jax.random.PRNGKey(1)
    state, loss = step(state, *data, key)
    float(loss)  # sync
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, *data, key)
        float(loss)
    dt = time.perf_counter() - t0
    return {
        "devices": n_devices,
        "frames_per_s": round(batch * steps / dt, 3),
        "frames_per_s_per_device": round(batch * steps / dt / n_devices, 3),
    }


def main() -> None:
    import jax

    # The driver environment's sitecustomize re-registers the TPU plugin and
    # rewrites jax_platforms at interpreter start; honor an explicit CPU
    # request (the virtual-device mode documented in the module docstring).
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    base = None
    for n in counts:
        r = measure(n)
        if base is None:
            base = r["frames_per_s_per_device"]
        r["scaling_efficiency"] = round(r["frames_per_s_per_device"] / base, 4)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
