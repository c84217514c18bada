"""Quality A/B: train with fp32 Adam moments vs bf16-stored moments.

WHY: ``TrainConfig.moment_dtype="bfloat16"`` halves optimizer-state HBM
(~0.95 GB at the shader net's 237 M params) — one of the activation-memory
levers for the full-512 step (docs/performance.md). The update arithmetic
stays fp32 (train/optim.py:scale_by_adam_moments); the only deviation is
the storage rounding of mu/nu between steps. This benchmark answers the
question that gates the default: does a shader training run with bf16
moments reach the same validation quality? Same design as the precedent
A/B for the multipass resample (resample_quality_ab.py /
benchmarks/results/resample_quality_ab_r2.json): identical seed, data and
steps in both arms; both arms evaluated with one shared eval executable.

PROTOCOL REGIME (round-5 saturation-death postmortem,
docs/performance.md): the round-4 run of this A/B at lr 1e-4 / 200 steps
produced an INVALID verdict — its fp32 arm had saturation-collapsed
(every sigmoid output exactly 0, gradients identically zero, params
bit-frozen at the all-black eval floor L1 0.1144) while the bf16 arm was
still moving, so the 4.6x "FAIL" compared a dead net to a live one.
Defaults now use the resample A/B's validated stable regime (lr 2e-5,
400 steps) and the eval stage asserts each arm is ALIVE (one extra train
step must move the restored params) before any verdict is emitted.

Usage: python benchmarks/moments_quality_ab.py [--steps 400] [--out DIR]
                                               [--stage all|train-fp32|
                                                train-bf16|eval]
Stages let each phase run in a FRESH process (long-lived processes that
accumulate many executables have been observed to wedge the tunneled TPU).
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
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--out", type=str, default="/tmp/moments_ab_v2")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--stage", default="all",
                   choices=["all", "train-fp32", "train-bf16", "eval"])
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

    def make_cfg(moment_dtype: str):
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
            sample_save=os.path.join(args.out, f"run_{moment_dtype}"),
            sample_every_steps=10_000,  # no mid-run dumps
            checkpoint_secs=10_000,
            cache_chunks=True,
            moment_dtype=moment_dtype,
            compute_dtype=(
                "bfloat16" if jax.default_backend() == "tpu" else "float32"
            ),
            seed=0,
        )

    model_cfg = ShaderConfig()

    def ckpt_dir(md):
        cfg = make_cfg(md)
        return os.path.join(cfg.sample_save, cfg.trained_model_name)

    def is_trained(md):
        return os.path.exists(
            os.path.join(ckpt_dir(md), "_CHECKPOINT_METADATA")
        )

    def train_once(md: str):
        if is_trained(md):
            print(json.dumps({"event": "already_trained", "moments": md}),
                  flush=True)
            return
        train_shader(make_cfg(md), model_cfg, max_steps=args.steps)
        print(json.dumps({"event": "trained", "moments": md}), flush=True)

    def restore(md):
        from rendernet_tpu.train.checkpoint import restore_checkpoint
        from rendernet_tpu.train.steps import create_shader_state

        state, _ = create_shader_state(
            jax.random.PRNGKey(0), model_cfg, make_cfg(md)
        )
        return restore_checkpoint(ckpt_dir(md), state)

    if args.stage in ("all", "train-fp32"):
        train_once("float32")
    if args.stage in ("all", "train-bf16"):
        train_once("bfloat16")
    if args.stage not in ("all", "eval"):
        return

    # ---- eval: ONE shared eval executable for both arms ----
    eval_step = make_shader_eval_step(model_cfg, make_cfg("float32"))

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

    def assert_alive(md, state):
        """One train step from the restored checkpoint must MOVE params —
        a saturation-dead arm (identically-zero gradients) freezes and
        would otherwise silently masquerade as a trained model."""
        from rendernet_tpu.train.steps import (
            create_shader_state,
            make_shader_train_step,
        )

        cfg = make_cfg(md)
        _, tx = create_shader_state(jax.random.PRNGKey(0), model_cfg, cfg)
        step = make_shader_train_step(model_cfg, cfg, tx, patch_size=128)
        loader = data_loader(
            tar, mdir, batch_size=args.batch, validation_mode=True,
            flatten=True, img_res=512, voxel_res=64,
        )
        images, voxels, poses, _ = next(iter(loader))
        st2, loss = step(state, jnp.asarray(voxels),
                         jnp.asarray(images / 255.0), jnp.asarray(poses),
                         jax.random.PRNGKey(99))
        delta = max(
            float(jnp.abs(st2.params[k].astype(jnp.float32)
                          - state.params[k].astype(jnp.float32)).max())
            for k in state.params
        )
        alive = delta > 1e-9 and np.isfinite(float(loss))
        print(json.dumps({"event": "liveness", "moments": md,
                          "max_param_delta": delta,
                          "train_loss": float(loss), "alive": bool(alive)}),
              flush=True)
        if not alive:
            raise SystemExit(
                f"arm {md!r} is DEAD at its checkpoint (max param delta "
                f"{delta:.3e} after one train step) — the A/B verdict "
                "would be an artifact; lower --lr (see module docstring)"
            )

    results = {}
    for md in ("float32", "bfloat16"):
        state = restore(md)
        assert_alive(md, state)
        results[md] = eval_l1(state.params)
        print(json.dumps({"event": "evaluated", "moments": md,
                          "l1": results[md]}), flush=True)
        del state

    out = {
        "bench": "moments_quality_ab",
        "steps": args.steps,
        "lr": args.lr,
        "batch": args.batch,
        "liveness": "both arms verified alive at eval (see module docstring)",
        "eval_l1_fp32_moments": round(results["float32"], 5),
        "eval_l1_bf16_moments": round(results["bfloat16"], 5),
        "l1_ratio_bf16_over_fp32": round(
            results["bfloat16"] / results["float32"], 4
        ),
        "backend": jax.default_backend(),
    }
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
