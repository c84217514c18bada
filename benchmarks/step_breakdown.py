"""Decompose the shader train step's wall time into its pieces (TPU).

bench.py's patch-64 step measures ~294 ms, but network fwd+bwd alone is
~99 ms and the crop-fused resample fwd+bwd ~64 ms — this bench times each
stage of the SAME step (same shapes, same dtypes, same donation) to locate
the residual. One JSON line per measurement.

Usage: python benchmarks/step_breakdown.py [--patch 64] [--batch 24]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(patch: int = 64, batch: int = 24, remat: bool = False,
         scan: bool = False, only: str = ''):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.nn.layers import Module
    from rendernet_tpu.models.shader import shader_rendernet
    from rendernet_tpu.ops.crops import crop_image, random_crop_offsets
    from rendernet_tpu.ops.pallas_resample import (
        rotate_resample_camera_patch_multipass,
        rotate_resample_to_camera_multipass,
    )
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.steps import (
        create_shader_state,
        make_shader_train_step,
        shader_loss_from_images,
    )

    cfg = TrainConfig(
        batch_size=batch, img_res=512, new_size=128,
        compute_dtype="bfloat16", is_greyscale=True, e_eta=1e-5,
    )
    model_cfg = ShaderConfig(remat=remat, scan_blocks=scan)
    state, tx = create_shader_state(jax.random.PRNGKey(0), model_cfg, cfg)
    rng = np.random.default_rng(0)
    voxels = jnp.asarray(
        (rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32)
    )
    images = jnp.asarray(rng.random((batch, 512, 512, 1)).astype(np.float32))
    poses = jnp.asarray(
        np.stack([rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch),
                  np.ones(batch)], axis=1).astype(np.float32)
    )
    key = jax.random.PRNGKey(1)

    def sync(x):
        leaves = jax.tree.leaves(x)
        return float(jnp.sum(leaves[0].astype(jnp.float32)))

    def measure(name, fn, args, n=8, donate=None):
        jitted = jax.jit(fn, donate_argnums=donate or ())
        out = jitted(*args)
        sync(out)
        if donate:
            # re-make donated inputs each timed call is unfair; instead
            # chain through the output like the real loop does.
            t0 = time.perf_counter()
            for _ in range(n):
                out = jitted(out[0] if isinstance(out, tuple) else out,
                             *args[1:])
            sync(out)
        else:
            t0 = time.perf_counter()
            for _ in range(n):
                out = jitted(*args)
            sync(out)
        ms = (time.perf_counter() - t0) / n * 1000
        print(json.dumps({"bench": name, "ms": round(ms, 3)}), flush=True)
        del out, jitted
        import gc

        gc.collect()
        return ms

    cdt = jnp.bfloat16

    def want(name):
        return not only or only == name

    # 1. full train step (the bench.py measurement)
    if want("step"):
      step = make_shader_train_step(model_cfg, cfg, tx, patch_size=patch)
      state2 = jax.tree.map(lambda x: x, state)
      out = step(state2, voxels, images, poses, key)
      float(out[1])
      t0 = time.perf_counter()
      n = 8
      for _ in range(n):
          out = step(out[0], voxels, images, poses, key)
      float(out[1])
      print(json.dumps({"bench": "full_train_step",
                        "ms": round((time.perf_counter() - t0) / n * 1000, 3)}),
            flush=True)
      # The full step donated `state`; drop every buffer the full-step
      # measurement still holds (at patch 128 the optimizer state + live
      # activations of TWO resident executables exceed HBM — use --only
      # to run each component in its own process when that still OOMs).
      import gc

      del step, out, state2
      gc.collect()
      state, tx = create_shader_state(jax.random.PRNGKey(0), model_cfg, cfg)

    # 2. value_and_grad of the loss (no optimizer)

    def loss_fn(params, voxels, images, poses, rng):
        crop_rng, drop_rng = jax.random.split(rng)
        if patch == cfg.new_size:
            vox_c = rotate_resample_to_camera_multipass(
                voxels, poses, new_size=cfg.new_size, compute_dtype=cdt)
            img_c = images
        else:
            offsets = random_crop_offsets(crop_rng, cfg.new_size, patch)
            vox_c = rotate_resample_camera_patch_multipass(
                voxels, poses, offsets, patch, new_size=cfg.new_size,
                compute_dtype=cdt)
            img_c = crop_image(images, offsets, patch, 4)
        m = Module(params=params, compute_dtype=cdt, train=True,
                   dropout_rng=drop_rng)
        pred = shader_rendernet(m, vox_c.astype(cdt), model_cfg)
        return shader_loss_from_images(pred, img_c, True)

    if want("loss"):
        measure("loss_fwd_bwd",
                lambda p, v, i, q, k: jax.value_and_grad(loss_fn)(p, v, i, q, k),
                (state.params, voxels, images, poses, key))

    # 3. resample+crop fwd+bwd alone (grads to voxels+poses)
    def res_loss(v, q, k):
        offsets = random_crop_offsets(k, cfg.new_size, patch)
        out = rotate_resample_camera_patch_multipass(
            v, q, offsets, patch, new_size=cfg.new_size, compute_dtype=cdt)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    if want("resample"):
        measure("resample_crop_fwd_bwd",
                lambda v, q, k: jax.grad(res_loss, argnums=(0, 1))(v, q, k),
                (voxels, poses, key))

    # 4. network fwd+bwd alone on a fixed camera patch
    cam = jnp.asarray(
        rng.random((batch, patch, patch, 128, 1)).astype(np.float32)
    )

    def net_loss(p, x, k):
        m = Module(params=p, compute_dtype=cdt, train=True, dropout_rng=k)
        pred = shader_rendernet(m, x.astype(cdt), model_cfg)
        return jnp.sum(pred.astype(jnp.float32) ** 2)

    if want("network"):
        measure("network_fwd_bwd",
                lambda p, x, k: jax.grad(net_loss)(p, x, k),
                (state.params, cam, key))

    # 4b. network fwd+bwd through the BCE loss (adds sigmoid/log path)
    img_c = jnp.asarray(
        rng.random((batch, patch * 4, patch * 4, 1)).astype(np.float32))

    def net_bce(p, x, t, k):
        m = Module(params=p, compute_dtype=cdt, train=True, dropout_rng=k)
        pred = shader_rendernet(m, x.astype(cdt), model_cfg)
        return shader_loss_from_images(pred, t, True)

    if want("network_bce"):
        measure("network_bce_fwd_bwd",
                lambda p, x, t, k: jax.grad(net_bce)(p, x, t, k),
                (state.params, cam, img_c, key))

    # 5. optimizer update alone (zeros stand in for grads — Adam's cost is
    # value-independent; real grads here would OOM next to the live state)
    grads = jax.tree.map(jnp.zeros_like, state.params)

    def opt_step(g, opt_state, params):
        updates, opt_state = tx.update(g, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state

    if want("optimizer"):
        measure("optimizer_update", opt_step,
                (grads, state.opt_state, state.params))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--only", type=str, default="",
                    help="run one measurement: step|loss|resample|network|"
                         "network_bce|optimizer (per-process isolation)")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--scan", action="store_true")
    a = ap.parse_args()
    main(a.patch, a.batch, a.remat, a.scan, a.only)
