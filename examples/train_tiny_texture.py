"""Train a committable texture/normal face showcase net (tiny or mid).

Produces the repo's second committed trained-weights artifact
(``assets/texture_tiny_face.npz`` + ``assets/texture_tiny_arch.json``):
a reduced-width two-head RenderNet (same topology as the reference's
RenderNet_Texture_Face_Normal.py:34-147 — texture decoder + albedo/normal
heads) trained on a synthetic colored-silhouette face-style dataset where
  * each identity's albedo COLOR is a deterministic function of its
    199-d texture code (data.synthetic.beta_to_rgb) — the albedo head can
    only succeed by decoding the texture code through the rotated texture
    grid, and
  * the normal target is the pose-dependent depth-gradient normal map
    (data.synthetic._render_sil_normal).
Powers tests/test_trained_golden_texture.py (golden regression + held-out
pose/identity quality gates).

``--arch mid`` trains the REFERENCE-SCALE-GRID variant (new_size=128,
512px targets — the camera-grid/image resolution of the reference's face
workload, RenderNet_Texture_Face_Normal.py) at committable width: it
powers the round-4 trained reference-scale inverse-rendering artifact
(examples/reconstruct_trained.py --arch mid) and its slow ranking test.

Usage: python examples/train_tiny_texture.py [--arch tiny|mid] [--steps N]
       [--out DIR]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ~1.9 M params: texture grid 16^3 (tex_base 8), 8-ch encoder trunk
# (projection width 16*8=128), base-8 heads, 64-deep camera grid (256^2).
TINY_TEX_ARCH = {
    "texture_dim": 199,
    "tex_base": 8,
    "enc_channels": [4, 8, 8],
    "res1_blocks": 2,
    "res2_blocks": 2,
    "res3_blocks": 1,
    "base": 8,
    "new_size": 64,
}

# ~6 M params at the REFERENCE camera-grid scale: 128-deep grid -> 512^2
# targets (projection width 32*8=256), reduced block counts/width so the
# weights stay committable (~23 MB npz).
MID_TEX_ARCH = {
    "texture_dim": 199,
    "tex_base": 8,
    "enc_channels": [4, 8, 8],
    "res1_blocks": 3,
    "res2_blocks": 3,
    "res3_blocks": 2,
    "base": 16,
    "new_size": 128,
}

ARCHS = {"tiny": TINY_TEX_ARCH, "mid": MID_TEX_ARCH}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", choices=("tiny", "mid"), default="tiny")
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--out", type=str, default="/tmp/rendernet_tiny_tex_run")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--decay_steps", type=int, default=8000)
    p.add_argument("--decay_rate", type=float, default=0.5)
    p.add_argument("--save_assets", action="store_true",
                   help="copy the trained npz + arch json into assets/")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.data import synthetic_face_dataset
    from rendernet_tpu.models.texture_face import TextureFaceConfig
    from rendernet_tpu.train.checkpoint import save_params_npz
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.loop import train_texture
    from rendernet_tpu.utils.image import save_image, to_uint8

    assets = sorted(glob.glob("/root/reference/binvox/*.binvox"))
    os.makedirs(args.out, exist_ok=True)
    ARCH = ARCHS[args.arch]
    img_res = 4 * ARCH["new_size"]
    # Train ring theta {60, 90, 105}; theta 75 held out for the quality
    # gate (same protocol as train_tiny_shader.py).
    poses = [(az, th) for az in range(10, 370, 20) for th in (60, 90, 105)]
    print(f"dataset: {len(assets)} identities x {len(poses)} poses @ {img_res}px")
    tar, mdir, tdir, ndir = synthetic_face_dataset(
        os.path.join(args.out, "data"), assets, poses_deg=poses,
        img_res=img_res,
    )

    cfg = TrainConfig(
        image_path=tar,
        model_path=mdir,
        texture_path=tdir,
        normal_path=ndir,
        is_greyscale=False,
        batch_size=args.batch,
        batches_chunk=2,
        img_res=img_res,
        new_size=ARCH["new_size"],
        e_eta=args.lr,
        decay_steps=args.decay_steps,
        decay_rate=args.decay_rate,
        curriculum_epochs=0,
        max_epochs=100000,
        sample_save=os.path.join(args.out, "run"),
        sample_every_steps=500,
        checkpoint_secs=10**9,
        cache_chunks=True,
    )
    arch = {k: tuple(v) if isinstance(v, list) else v
            for k, v in ARCH.items()}
    model_cfg = TextureFaceConfig(**arch)

    losses = []
    t0 = time.time()
    state = train_texture(
        cfg, model_cfg, max_steps=args.steps,
        progress=lambda s, l: losses.append((s, l)),
    )
    wall = time.time() - t0

    params = jax.device_get(state.params)
    n_params = sum(int(np.asarray(v).size) for v in jax.tree_util.tree_leaves(params))
    npz_path = os.path.join(args.out, f"texture_{args.arch}_face.npz")
    save_params_npz(npz_path, params)

    # Held-out evaluation: render every identity at the held-out theta=75
    # ring and compare albedo/normal against the dataset generator.
    import scipy.io

    from rendernet_tpu.data.pose import pose_from_name, pose_to_name_suffix
    from rendernet_tpu.data.synthetic import _render_sil_normal, beta_to_rgb
    from rendernet_tpu.io import load_binvox
    from rendernet_tpu.models.texture_face import texture_face_forward

    fwd = jax.jit(
        lambda p, v, t, q: texture_face_forward(p, v, t, q, model_cfg)
    )
    alb_l1s, nrm_l1s = [], []
    for i, bv in enumerate(sorted(glob.glob(os.path.join(mdir, "*.binvox")))):
        ident = os.path.basename(bv)[:-len(".binvox")]
        vox_np = load_binvox(bv).astype(np.float32)
        beta = scipy.io.loadmat(
            os.path.join(tdir, f"beta{ident.split('ly')[1]}.mat")
        )["beta"].reshape(1, -1).astype(np.float32)
        az, th = 42.0, 75.0  # az between grid points, theta ring held out
        pose = pose_from_name("x" + pose_to_name_suffix(az, th, 3.3))
        albedo, normal = fwd(
            state.params,
            jnp.asarray(vox_np[None, :, :, :, None]),
            jnp.asarray(beta),
            jnp.asarray(pose[None]),
        )
        sil, nrm_t = _render_sil_normal(vox_np, pose, img_res)
        alb_t = sil[..., None] * beta_to_rgb(beta)[None, None, :]
        alb_l1s.append(float(np.abs(np.asarray(albedo[0]) - alb_t).mean()))
        nrm_l1s.append(float(np.abs(np.asarray(normal[0]) - nrm_t).mean()))
        if i == 0:
            save_image(to_uint8(np.asarray(albedo[0]), 255.0),
                       os.path.join(args.out, "eval_albedo.png"))
            save_image(to_uint8(alb_t, 255.0),
                       os.path.join(args.out, "eval_albedo_target.png"))
            save_image(to_uint8(np.asarray(normal[0]), 255.0),
                       os.path.join(args.out, "eval_normal.png"))

    summary = {
        "steps": len(losses),
        "wall_s": round(wall, 1),
        "n_params": n_params,
        "loss_first5_mean": round(float(np.mean([float(l) for _, l in losses[:5]])), 5),
        "loss_last5_mean": round(float(np.mean([float(l) for _, l in losses[-5:]])), 5),
        "heldout_albedo_l1_per_identity": [round(x, 4) for x in alb_l1s],
        "heldout_albedo_l1_mean": round(float(np.mean(alb_l1s)), 4),
        "heldout_normal_l1_per_identity": [round(x, 4) for x in nrm_l1s],
        "heldout_normal_l1_mean": round(float(np.mean(nrm_l1s)), 4),
        "backend": jax.default_backend(),
        "npz": npz_path,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))

    if args.save_assets:
        import shutil

        adir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"
        )
        os.makedirs(adir, exist_ok=True)
        shutil.copy(
            npz_path, os.path.join(adir, f"texture_{args.arch}_face.npz")
        )
        with open(os.path.join(
                adir, f"texture_{args.arch}_arch.json"), "w") as f:
            json.dump(ARCH, f, indent=2)
        # a training identity's beta, for recon ground-truth latents
        beta1 = scipy.io.loadmat(os.path.join(tdir, "beta80001.mat"))
        np.save(os.path.join(adir, f"texture_{args.arch}_beta1.npy"),
                beta1["beta"].reshape(-1).astype(np.float32))
        print(f"assets saved to {adir}")


if __name__ == "__main__":
    main()
