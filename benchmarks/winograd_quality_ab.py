"""Quality A/B: train with XLA convs vs the Winograd F(2x2,3x3) path.

WHY: Winograd cuts the wide res-stack convs' MACs 2.25x (ops/winograd.py)
but its transforms amplify bf16 rounding (bounded per-op by
tests/test_winograd.py); the question that gates any default flip is
end-to-end: does a shader training run through the Winograd convs reach
the same validation quality? Same protocol as the resample and moments
A/Bs: identical seed, data and steps in both arms; both arms evaluated
with one shared (XLA-conv) eval executable.

PROTOCOL REGIME (round-5 lesson, the saturation-death postmortem in
docs/performance.md): at lr 1e-4 the summed-BCE 512px shader run
COLLAPSES — bf16 sigmoid saturation drives every output to exactly 0,
gradients become identically zero, and the arm freezes at the all-black
eval floor (L1 0.1144 on this dataset) while LOOKING "trained". Two
round-4/5 gate verdicts were artifacts of comparing a dead arm to a live
one. Defaults are therefore the resample A/B's validated stable regime
(lr 2e-5, 400 steps — both arms converge to ~0.013-0.019 L1, far below
the floor), and the eval stage ASSERTS LIVENESS of each arm: one extra
train step must move the restored params, and the eval render must not
be saturation-pinned. A gate verdict without live arms is an error, not
a result.

Usage: python benchmarks/winograd_quality_ab.py [--steps 400] [--out DIR]
                                               [--stage all|train-xla|
                                                train-winograd|eval]
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
    p.add_argument("--out", type=str, default="/tmp/winograd_ab_v2")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--stage", default="all",
                   choices=["all", "train-xla", "train-winograd",
                            "train-wgrad", "train-wgradf", "eval"])
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

    def make_cfg(arm: str):
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
            sample_save=os.path.join(args.out, f"run_{arm}"),
            sample_every_steps=10_000,  # no mid-run dumps
            checkpoint_secs=10_000,
            cache_chunks=True,
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

    def train_once(arm: str):
        if is_trained(arm):
            print(json.dumps({"event": "already_trained", "arm": arm}),
                  flush=True)
            return
        from rendernet_tpu.nn import layers
        from rendernet_tpu.ops import pallas_winograd

        # train the winograd arm through the FUSED kernel (the deployable
        # impl — the XLA expression is a measured perf negative; numerics
        # are the same algorithm either way); the "wgrad" arm additionally
        # routes the weight grad through the fused transform-domain
        # kernel (phase 2) instead of XLA's conv wgrad
        layers.WINOGRAD_2D = (
            "pallas" if arm in ("winograd", "wgrad", "wgradf") else False
        )
        pallas_winograd.WGRAD = (
            "fp32" if arm == "wgradf" else arm == "wgrad"
        )
        try:
            train_shader(make_cfg(arm), model_cfg, max_steps=args.steps)
        finally:
            layers.WINOGRAD_2D = False
            pallas_winograd.WGRAD = False
        print(json.dumps({"event": "trained", "arm": arm}), flush=True)

    def restore(md):
        from rendernet_tpu.train.checkpoint import restore_checkpoint
        from rendernet_tpu.train.steps import create_shader_state

        state, _ = create_shader_state(
            jax.random.PRNGKey(0), model_cfg, make_cfg(md)
        )
        return restore_checkpoint(ckpt_dir(md), state)

    if args.stage in ("all", "train-xla"):
        train_once("xla")
    if args.stage in ("all", "train-winograd"):
        train_once("winograd")
    if args.stage == "train-wgrad":  # optional third arm
        train_once("wgrad")
    if args.stage == "train-wgradf":  # optional fourth arm (fp32 wgrad)
        train_once("wgradf")
    if args.stage not in ("all", "eval"):
        return

    # ---- eval: ONE shared eval executable for both arms ----
    eval_step = make_shader_eval_step(model_cfg, make_cfg("xla"))

    def eval_l1(params):
        l1s = []
        sat = []
        loader = data_loader(
            tar, mdir, batch_size=args.batch, validation_mode=True,
            flatten=True, img_res=512, voxel_res=64,
        )
        for images, voxels, poses, names in loader:
            pred = eval_step(params, jnp.asarray(voxels), jnp.asarray(poses))
            l1s.append(
                float(jnp.mean(jnp.abs(jnp.asarray(images / 255.0) - pred)))
            )
            sat.append(float(jnp.mean(
                (pred <= 1e-6) | (pred >= 1.0 - 1e-6)
            )))
        return float(np.mean(l1s)), float(np.mean(sat))

    def assert_alive(arm, state):
        """One train step from the restored checkpoint must MOVE params —
        a saturation-dead arm (identically-zero gradients) freezes and
        would otherwise silently masquerade as a trained model."""
        from rendernet_tpu.train.steps import (
            create_shader_state,
            make_shader_train_step,
        )

        cfg = make_cfg(arm)
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
        print(json.dumps({"event": "liveness", "arm": arm,
                          "max_param_delta": delta,
                          "train_loss": float(loss), "alive": bool(alive)}),
              flush=True)
        if not alive:
            raise SystemExit(
                f"arm {arm!r} is DEAD at its checkpoint (max param delta "
                f"{delta:.3e} after one train step) — the A/B verdict "
                "would be an artifact; lower --lr (see module docstring)"
            )

    results = {}
    arms = ["xla", "winograd"] + [
        a for a in ("wgrad", "wgradf") if is_trained(a)
    ]
    for arm in arms:
        state = restore(arm)
        assert_alive(arm, state)
        results[arm], sat_frac = eval_l1(state.params)
        print(json.dumps({"event": "evaluated", "arm": arm,
                          "l1": results[arm],
                          "saturated_frac": round(sat_frac, 4)}), flush=True)
        del state

    out = {
        "bench": "winograd_quality_ab",
        "steps": args.steps,
        "lr": args.lr,
        "batch": args.batch,
        "liveness": "both arms verified alive at eval (see module docstring)",
        "eval_l1_xla_trained": round(results["xla"], 5),
        "eval_l1_winograd_trained": round(results["winograd"], 5),
        "l1_ratio_winograd_over_xla": round(
            results["winograd"] / results["xla"], 4
        ),
        **{
            k: v
            for a in ("wgrad", "wgradf")
            if a in results
            for k, v in {
                f"eval_l1_{a}_trained": round(results[a], 5),
                f"l1_ratio_{a}_over_xla": round(
                    results[a] / results["xla"], 4
                ),
            }.items()
        },
        "backend": jax.default_backend(),
    }
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
