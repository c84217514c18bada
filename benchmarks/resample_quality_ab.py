"""Quality A/B: train with the EXACT trilinear resample vs the fast
MULTIPASS Pallas kernel, then evaluate both models with one common warp.

WHY: `TrainConfig.resample="auto"` makes multipass the TPU training
default (train/config.py); its separable reconstruction filter smooths
slightly more than direct trilinear (bounded by unit tests), but the
question that matters is end-to-end: does training on multipass-resampled
grids reach the same validation quality? This benchmark trains the shader
twice on the self-rendered synthetic-chairs workload (identical seed,
data, steps) and reports full-dataset eval L1 for both.

Both arms are EVALUATED with the multipass warp: applying the same
transform to both isolates the TRAINING-time difference, and the
exact-warp full-512 eval graph is the pathological XLA naive-gather path
(measured >45 min compile+load on the tunneled TPU — the very path this
framework replaces; the warps themselves are cross-validated by
tests/test_pallas_resample.py).

Re-runs restore any arm whose checkpoint already exists in --out, so an
interrupted A/B resumes instead of retraining.

Reference anchor for the resample semantics:
tools/resampling_voxel_grid.py:564-632.

Usage: python benchmarks/resample_quality_ab.py [--steps 200] [--out DIR]
                                                 [--stage all|train-exact|
                                                  train-multipass|eval]
Stages let each phase run in a FRESH process (long-lived processes that
accumulate many executables have been observed to wedge on the tunneled
TPU); `--stage eval` restores both checkpoints and prints the JSON line.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--out", type=str, default="/tmp/resample_ab")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--stage", default="all",
                   choices=["all", "train-exact", "train-multipass", "eval"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.data import make_synthetic_shader_tar
    from rendernet_tpu.data.loaders import data_loader
    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.loop import train_shader
    from rendernet_tpu.train.steps import make_shader_eval_step

    assets = sorted(glob.glob("/root/reference/binvox/*.binvox"))
    os.makedirs(args.out, exist_ok=True)
    tar, mdir = make_synthetic_shader_tar(
        os.path.join(args.out, "data"),
        assets,
        poses_deg=[(az, th) for az in (20, 110, 200, 290) for th in (60, 90)],
        img_res=512,
    )

    def make_cfg(method: str):
        return TrainConfig(
            image_path=tar,
            model_path=mdir,
            batch_size=args.batch,
            batches_chunk=2,
            img_res=512,
            new_size=128,
            e_eta=args.lr,
            curriculum_epochs=0,
            max_epochs=1000,
            sample_save=os.path.join(args.out, f"run_{method}"),
            sample_every_steps=10_000,  # no mid-run dumps
            checkpoint_secs=10_000,
            cache_chunks=True,
            resample=method,
            compute_dtype=(
                "bfloat16" if jax.default_backend() == "tpu" else "float32"
            ),
            seed=0,
        )

    model_cfg = ShaderConfig()

    def ckpt_dir(method):
        cfg = make_cfg(method)
        return os.path.join(cfg.sample_save, cfg.trained_model_name)

    def is_trained(method):
        d = ckpt_dir(method)
        return os.path.exists(os.path.join(d, "_CHECKPOINT_METADATA"))

    def train_once(method: str):
        if is_trained(method):
            print(json.dumps({"event": "already_trained", "method": method}),
                  flush=True)
            return
        train_shader(make_cfg(method), model_cfg, max_steps=args.steps)
        print(json.dumps({"event": "trained", "method": method}), flush=True)

    def restore(method):
        from rendernet_tpu.train.checkpoint import restore_checkpoint
        from rendernet_tpu.train.steps import create_shader_state

        state, _ = create_shader_state(
            jax.random.PRNGKey(0), model_cfg, make_cfg(method)
        )
        return restore_checkpoint(ckpt_dir(method), state)

    if args.stage in ("all", "train-exact"):
        train_once("exact")
    if args.stage in ("all", "train-multipass"):
        train_once("multipass")
    if args.stage not in ("all", "eval"):
        return

    # ---- eval: one shared multipass-warp executable for both arms ----
    import dataclasses

    eval_cfg = dataclasses.replace(make_cfg("multipass"), resample="multipass")
    eval_step = make_shader_eval_step(model_cfg, eval_cfg)

    def eval_l1(params):
        l1s = []
        loader = data_loader(
            tar, mdir, batch_size=args.batch, validation_mode=True,
            flatten=True, img_res=512, voxel_res=64,
        )
        for images, voxels, poses, names in loader:
            pred = eval_step(params, jnp.asarray(voxels), jnp.asarray(poses))
            l1s.append(
                float(jnp.mean(jnp.abs(jnp.asarray(images / 255.0) - pred)))
            )
        return float(np.mean(l1s))

    from rendernet_tpu.io import load_binvox

    vox = jnp.asarray(
        load_binvox(assets[0]).astype(np.float32)[None, :, :, :, None]
    )
    pose = jnp.asarray([[0.9, 0.4, 1.0]], jnp.float32)

    results, renders = {}, {}
    for method in ("exact", "multipass"):
        state = restore(method)
        results[method] = eval_l1(state.params)
        print(json.dumps({"event": "evaluated", "method": method,
                          "l1": results[method]}), flush=True)
        renders[method] = np.asarray(eval_step(state.params, vox, pose))[0]
        del state

    render_l1 = float(np.mean(np.abs(renders["exact"] - renders["multipass"])))
    out = {
        "bench": "resample_quality_ab",
        "steps": args.steps,
        "eval_l1_exact_trained": round(results["exact"], 5),
        "eval_l1_multipass_trained": round(results["multipass"], 5),
        "l1_ratio_multipass_over_exact": round(
            results["multipass"] / results["exact"], 4
        ),
        "cross_model_render_l1": round(render_l1, 5),
        "backend": jax.default_backend(),
    }
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
