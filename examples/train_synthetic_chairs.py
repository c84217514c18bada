"""End-to-end demo: train the shader on self-rendered silhouette data.

Builds a synthetic ShapeNet-style dataset from the bundled binvox assets
(rendered with the framework's own differentiable renderer), then runs real
shader training through the full stack — tar streaming, pose parsing, device
mesh, jitted steps, checkpoints — and dumps before/after renders.

Usage: python examples/train_synthetic_chairs.py [--steps N] [--out DIR]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--out", type=str, default="/tmp/rendernet_demo_run")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--img-res", type=int, default=512,
                   help="must be 4x the camera grid (128)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.data import make_synthetic_shader_tar
    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.loop import train_shader
    from rendernet_tpu.train.steps import make_shader_eval_step
    from rendernet_tpu.utils.image import save_image, to_uint8

    assets = sorted(glob.glob("/root/reference/binvox/*.binvox"))
    os.makedirs(args.out, exist_ok=True)
    print(f"dataset: {len(assets)} assets -> {args.out}")
    tar, mdir = make_synthetic_shader_tar(
        os.path.join(args.out, "data"),
        assets,
        poses_deg=[(az, th) for az in (20, 110, 200, 290) for th in (60, 90)],
        img_res=args.img_res,
    )

    cfg = TrainConfig(
        image_path=tar,
        model_path=mdir,
        batch_size=args.batch,
        batches_chunk=2,
        img_res=args.img_res,
        new_size=args.img_res // 4,
        e_eta=args.lr,
        curriculum_epochs=0,  # 64-patches from the start (32-crops are mostly
        # empty background on sparse silhouette data and bias the net black)
        max_epochs=1000,
        sample_save=os.path.join(args.out, "run"),
        sample_every_steps=20,
        checkpoint_secs=600,
        cache_chunks=True,  # tiny deterministic dataset: keep it on-device
    )
    model_cfg = ShaderConfig()

    losses = []
    t0 = time.time()
    state = train_shader(
        cfg, model_cfg, max_steps=args.steps,
        progress=lambda s, l: losses.append((s, l)),
    )
    wall = time.time() - t0

    # Render one asset before/after comparison at full resolution.
    from rendernet_tpu.io import load_binvox

    eval_step = make_shader_eval_step(model_cfg, cfg)
    vox = jnp.asarray(
        load_binvox(assets[0]).astype(np.float32)[None, :, :, :, None]
    )
    pose = jnp.asarray([[20 * np.pi / 180, 30 * np.pi / 180, 1.0]], jnp.float32)
    img = np.asarray(eval_step(state.params, vox, pose))[0]
    save_image(to_uint8(img, 255.0), os.path.join(args.out, "final_render.png"))

    first = np.mean([l for _, l in losses[:5]])
    last = np.mean([l for _, l in losses[-5:]])
    summary = {
        "steps": len(losses),
        "wall_s": round(wall, 1),
        "loss_first5_mean": round(float(first), 2),
        "loss_last5_mean": round(float(last), 2),
        "loss_reduction": round(float(1 - last / first), 4),
        "backend": jax.default_backend(),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
