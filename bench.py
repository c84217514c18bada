"""Benchmark: shader fwd+bwd training throughput at 512x512 output.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the BASELINE.json north-star: 512^2 frames/s/chip, forward +
backward, through the full pipeline (pose transform -> trilinear resample ->
shader RenderNet -> BCE loss -> grads -> Adam update), bf16 compute on the
MXU. The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
reports against a fixed reference budget of 2.0 frames/s (a generous
estimate for the TF 1.x single-GPU pipeline of its era); the driver records
absolute values across rounds either way.

Batch size auto-scales down if the device is small; value is normalized to
frames (samples) per second per chip regardless.
"""
from __future__ import annotations

import json
import time


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.steps import create_shader_state, make_shader_train_step

    n_chips = 1  # single-chip benchmark; multi-chip scaling measured separately
    # Experiment knobs (defaults = the recorded metric's configuration).
    env_batch = int(os.environ.get("RENDERNET_BENCH_BATCH", "24"))
    env_remat = bool(int(os.environ.get("RENDERNET_BENCH_REMAT", "0")))
    env_scan = bool(int(os.environ.get("RENDERNET_BENCH_SCAN", "0")))

    def build(batch):
        cfg = TrainConfig(
            batch_size=batch,
            img_res=512,
            new_size=128,
            compute_dtype="bfloat16",
            is_greyscale=True,
            e_eta=1e-5,
        )
        model_cfg = ShaderConfig(remat=env_remat, scan_blocks=env_scan)
        state, tx = create_shader_state(jax.random.PRNGKey(0), model_cfg, cfg)
        # Training patch = 64 (the curriculum's steady state); full 128 is
        # the eval path.
        step = make_shader_train_step(model_cfg, cfg, tx, patch_size=64)
        rng = np.random.default_rng(0)
        voxels = jnp.asarray(
            (rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32)
        )
        images = jnp.asarray(rng.random((batch, 512, 512, 1)).astype(np.float32))
        poses = jnp.asarray(
            np.stack(
                [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch),
                 np.ones(batch)],
                axis=1,
            ).astype(np.float32)
        )
        return step, state, (voxels, images, poses)

    key = jax.random.PRNGKey(1)
    batch = env_batch
    while True:
        try:
            step, state, batch_data = build(batch)
            state, loss = step(state, *batch_data, key)  # compile + warm up
            float(loss)
            break
        except Exception:
            if batch <= 1:
                raise
            batch //= 2

    # Timed steps. Steps chain through the donated optimizer state, so one
    # host fetch of the LAST loss forces the whole sequence; syncing every
    # step would add a host->device round trip per step (~30 ms through
    # the tunneled platform) that a real input-pipelined training loop
    # doesn't pay. (block_until_ready on a donated-aliased scalar has been
    # observed to return early on the tunnel, hence the float() fetch.)
    n_steps = 8
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state, *batch_data, key)
    float(loss)
    dt = time.perf_counter() - t0

    frames_per_s = batch * n_steps / dt / n_chips
    baseline = 2.0  # frames/s budget for the reference-era single GPU
    print(
        json.dumps(
            {
                "metric": "shader_train_frames_per_s_per_chip_512px",
                "value": round(frames_per_s, 4),
                "unit": "frames/s/chip (fwd+bwd, batch %d, bf16)" % batch,
                "vs_baseline": round(frames_per_s / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
