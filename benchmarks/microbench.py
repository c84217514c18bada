"""Component microbenchmarks (one JSON line per measurement).

Times the hot pieces individually on the current backend: exact vs
multipass resample (fwd, fwd+bwd), shader network fwd/fwd+bwd at the
training patch size, and the end-to-end train step. Useful for tracking
optimization work across rounds.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax.numpy as jnp

    if isinstance(x, tuple):
        x = x[0]
    return float(jnp.sum(x))


def timeit(name, fn, *args, n=3):
    fn(*args)
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(fn(*args))
    ms = (time.perf_counter() - t0) / n * 1000
    print(json.dumps({"bench": name, "ms": round(ms, 2)}))
    return ms


def main(batch: int = 24):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.models.shader import ShaderConfig, init_shader_params, shader_rendernet
    from rendernet_tpu.nn.layers import Module
    from rendernet_tpu.ops.pallas_resample import rotate_resample_multipass
    from rendernet_tpu.ops.resample import rotate_resample
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.steps import create_shader_state, make_shader_train_step

    rng = np.random.default_rng(0)
    vox = jnp.asarray((rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32))
    pose = jnp.asarray(
        np.stack(
            [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch),
             np.full(batch, 1.05)],
            axis=1,
        ).astype(np.float32)
    )

    mp = jax.jit(lambda v, p: rotate_resample_multipass(v, p, new_size=128))
    timeit("multipass_fwd", mp, vox, pose)
    mpg = jax.jit(
        jax.grad(
            lambda v, p: jnp.sum(rotate_resample_multipass(v, p, new_size=128) ** 2),
            argnums=(0, 1),
        )
    )
    timeit("multipass_fwd_bwd", mpg, vox, pose)

    from rendernet_tpu.ops.pallas_resample import (
        rotate_resample_camera_patch_multipass,
    )

    offs = jnp.asarray([17, 40], jnp.int32)
    mpp = jax.jit(
        jax.grad(
            lambda v, p: jnp.sum(
                rotate_resample_camera_patch_multipass(v, p, offs, 64) ** 2
            ),
            argnums=(0, 1),
        )
    )
    timeit("multipass_patch64_fwd_bwd", mpp, vox, pose)

    # bf16 data path: halves the HBM traffic of every pass/flip/transpose;
    # geometry + pose grads stay f32 inside the kernels.
    mp16 = jax.jit(
        lambda v, p: rotate_resample_multipass(
            v, p, new_size=128, compute_dtype=jnp.bfloat16
        )
    )
    timeit("multipass_fwd_bf16", mp16, vox, pose)
    mpp16 = jax.jit(
        jax.grad(
            lambda v, p: jnp.sum(
                rotate_resample_camera_patch_multipass(
                    v, p, offs, 64, compute_dtype=jnp.bfloat16
                ).astype(jnp.float32) ** 2
            ),
            argnums=(0, 1),
        )
    )
    timeit("multipass_patch64_fwd_bwd_bf16", mpp16, vox, pose)

    if jax.default_backend() != "tpu":
        ex = jax.jit(lambda v, p: rotate_resample(v, p, new_size=128))
        timeit("exact_fwd", ex, vox, pose)

    cfg = ShaderConfig()
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    patch = jnp.asarray(rng.random((batch, 64, 64, 128, 1)).astype(np.float32))

    def net(p, x):
        m = Module(params=p, compute_dtype=jnp.bfloat16)
        return shader_rendernet(m, x.astype(jnp.bfloat16), cfg)

    timeit("network_fwd_patch64", jax.jit(net), params, patch)
    gnet = jax.jit(
        jax.grad(lambda p, x: jnp.sum(net(p, x).astype(jnp.float32) ** 2))
    )
    timeit("network_fwd_bwd_patch64", lambda p, x: gnet(p, x)["encoder/e_conv11/weights"], params, patch)

    tcfg = TrainConfig(
        batch_size=batch, img_res=512, new_size=128,
        compute_dtype="bfloat16", is_greyscale=True, e_eta=1e-5,
    )
    state, tx = create_shader_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_shader_train_step(cfg, tcfg, tx, patch_size=64)
    img = jnp.asarray(rng.random((batch, 512, 512, 1)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    def run_step(s, v, i, p):
        ns, loss = step(s, v, i, p, key)
        return loss

    # NB step donates state; re-create between timed calls is too slow, so
    # time via a chain that reuses the returned state.
    state, loss = step(state, vox, img, pose, key)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(4):
        state, loss = step(state, vox, img, pose, key)
        float(loss)
    ms = (time.perf_counter() - t0) / 4 * 1000
    print(json.dumps({"bench": "train_step_batch24_512px", "ms": round(ms, 2),
                      "frames_per_s": round(batch / (ms / 1000), 2)}))


if __name__ == "__main__":
    main()
