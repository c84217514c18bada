"""Train the committable "tiny" shader showcase net on synthetic data.

Produces the repo's committed trained-weights artifact
(``assets/shader_tiny_silhouette.npz`` + ``assets/shader_tiny_arch.json``):
a reduced-width RenderNet shader (same topology as the reference's
RenderNet_Shader.py:32-131, scaled to ~1 M params so the weights fit in
git) trained on self-rendered silhouette data from the bundled binvox
assets. The committed artifact powers the golden-image regression test
(tests/test_trained_golden.py) and the demo-CLI trained GIF sweep.

Usage: python examples/train_tiny_shader.py [--steps N] [--out DIR]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The tiny architecture: topology-identical to the full shader (3-conv
# encoder, 3D/2D res stacks, projection unit, deconv chain) with a 64-deep
# camera grid (256^2 output), 8-channel encoder (projection width
# 16*8=128) and a base-4 deconv chain. ~1.05 M params.
TINY_ARCH = {
    "out_channels": 1,
    "enc_channels": [8, 8, 8],
    "res1_blocks": 2,
    "res2_blocks": 2,
    "res3_blocks": 1,
    "base": 4,
    "new_size": 64,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--out", type=str, default="/tmp/rendernet_tiny_run")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--decay_steps", type=int, default=100_000)
    p.add_argument("--decay_rate", type=float, default=0.96)
    p.add_argument("--save_assets", action="store_true",
                   help="copy the trained npz + arch json into assets/")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.data import make_synthetic_shader_tar
    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.checkpoint import save_params_npz
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.loop import train_shader
    from rendernet_tpu.train.steps import make_shader_eval_step
    from rendernet_tpu.utils.image import save_image, to_uint8

    assets = sorted(glob.glob("/root/reference/binvox/*.binvox"))
    os.makedirs(args.out, exist_ok=True)
    img_res = 4 * TINY_ARCH["new_size"]
    # Dense pose grid (az step 20, four elevation rings) so interpolated
    # held-out poses render near trained quality; theta 75 (elevation 15)
    # is deliberately absent — it is the held-out ring the quality tests
    # probe (tests/test_trained_golden.py).
    poses = [(az, th) for az in range(10, 370, 20) for th in (45, 60, 90, 105)]
    print(f"dataset: {len(assets)} assets x {len(poses)} poses @ {img_res}px")
    tar, mdir = make_synthetic_shader_tar(
        os.path.join(args.out, "data"), assets, poses_deg=poses,
        img_res=img_res,
    )

    cfg = TrainConfig(
        image_path=tar,
        model_path=mdir,
        batch_size=args.batch,
        batches_chunk=2,
        img_res=img_res,
        new_size=TINY_ARCH["new_size"],
        e_eta=args.lr,
        decay_steps=args.decay_steps,
        decay_rate=args.decay_rate,
        curriculum_epochs=0,
        max_epochs=100000,
        sample_save=os.path.join(args.out, "run"),
        sample_every_steps=500,
        checkpoint_secs=10**9,  # no mid-run checkpoints; we save npz at the end
        cache_chunks=True,
    )
    arch = {k: tuple(v) if isinstance(v, list) else v for k, v in TINY_ARCH.items()}
    model_cfg = ShaderConfig(**arch)

    losses = []
    t0 = time.time()
    state = train_shader(
        cfg, model_cfg, max_steps=args.steps,
        progress=lambda s, l: losses.append((s, l)),
    )
    wall = time.time() - t0

    params = jax.device_get(state.params)
    n_params = sum(int(np.asarray(v).size) for v in jax.tree_util.tree_leaves(params))
    npz_path = os.path.join(args.out, "shader_tiny_silhouette.npz")
    save_params_npz(npz_path, params)

    # Held-out evaluation: render every asset from a pose NOT in the
    # training set and compare against the ground-truth silhouette renderer.
    from rendernet_tpu.data.pose import pose_from_name, pose_to_name_suffix
    from rendernet_tpu.data.synthetic import _render_silhouette
    from rendernet_tpu.io import load_binvox

    eval_step = make_shader_eval_step(model_cfg, cfg)
    l1s = []
    for i, bv in enumerate(assets):
        vox_np = load_binvox(bv).astype(np.float32)
        az, th = 42.0, 75.0  # held out: training grid is az%45==20, th in {60,90}
        pose = pose_from_name("x" + pose_to_name_suffix(az, th, 3.3))
        img = np.asarray(
            eval_step(
                state.params,
                jnp.asarray(vox_np[None, :, :, :, None]),
                jnp.asarray(pose[None]),
            )
        )[0, :, :, 0]
        target = _render_silhouette(vox_np, pose, img_res) / 255.0
        l1s.append(float(np.abs(img - target).mean()))
        if i == 0:
            save_image(to_uint8(img, 255.0), os.path.join(args.out, "eval_render.png"))
            save_image(to_uint8(target, 255.0), os.path.join(args.out, "eval_target.png"))

    summary = {
        "steps": len(losses),
        "wall_s": round(wall, 1),
        "n_params": n_params,
        "loss_first5_mean": round(float(np.mean([l for _, l in losses[:5]])), 3),
        "loss_last5_mean": round(float(np.mean([l for _, l in losses[-5:]])), 3),
        "heldout_l1_per_asset": [round(x, 4) for x in l1s],
        "heldout_l1_mean": round(float(np.mean(l1s)), 4),
        "backend": jax.default_backend(),
        "npz": npz_path,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))

    if args.save_assets:
        import shutil

        adir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")
        os.makedirs(adir, exist_ok=True)
        shutil.copy(npz_path, os.path.join(adir, "shader_tiny_silhouette.npz"))
        with open(os.path.join(adir, "shader_tiny_arch.json"), "w") as f:
            json.dump(TINY_ARCH, f, indent=2)
        print(f"assets saved to {adir}")


if __name__ == "__main__":
    main()
