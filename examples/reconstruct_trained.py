"""Inverse rendering through the COMMITTED TRAINED nets (quality evidence).

The reference's reconstruction workload (Reconstruct_RenderNet_Face.py)
searches pose/texture/light/shape latents through FROZEN PRETRAINED nets.
Its released weights are unfetchable in this environment (ROADMAP.md), so
this is the same capability demonstrated end-to-end at committable scale:

  * renderer = the committed trained tiny texture/normal two-head net
    (assets/texture_tiny_face.npz, trained by examples/train_tiny_texture.py);
  * target   = albedo * np-Phong composite at a known (pose, beta, light)
    — synthesized exactly like the reference's target (:435-447), using
    the trained net's own render of the GT latents;
  * trainables = pose (coarse-to-fine 5-hypothesis box search, :458-473),
    199-d texture code, light azimuth — the reference's latent groups
    minus shape-z (the tiny pipeline keeps the voxel grid fixed; the
    full-scale shape decoder path is exercised by
    examples/inverse_render_synthetic.py and tests/test_recon.py);
  * machinery = the real driver: rendernet_tpu.recon.reconstruct with a
    custom loss_fn over the trained net (lax.scan inner loop, per-group
    learning rates, best-of-batch subdivision).

Writes a results JSON with per-epoch pose error (deg), recovered-color
error, light error, final image L1, and the loss curves.

Committed artifact (benchmarks/results/reconstruct_trained_r3.json, TPU,
--epochs 8 --inner-steps 60 --pose-eta 0.03 --theta-range0 0, bf16):
azimuth 11.0 deg, elevation 8.1 deg, light 4.7 deg, albedo-color L1
0.117 (random init ~0.25), image L1 0.037. Observability findings from
the A/Bs that chose this config (all runs under /tmp/recon_trained_r3*):
  * azimuth is strongly observable — the box search + gradients recover
    it from a +-30 deg box whether or not elevation is searched;
  * ELEVATION is weakly observable for this scene: adapted texture
    (a 64^3 color field) and light can compensate small elevation error,
    so the epoch-0 corner ranking picks the wrong elevation sign
    (az converges to 6 deg but el sticks ~19 deg off when a 2D box is
    searched), and the elevation gradient is ~20x weaker than azimuth's.
    Searching azimuth only (theta_range0=0) and refining elevation by
    gradient gives the best combined error;
  * ranking too EARLY (12-step epochs) is worse: before the shared
    texture color converges, MSE favors smaller-silhouette poses.

``--arch mid`` runs the same workload through the REFERENCE-SCALE-GRID
trained net (assets/texture_mid_face.npz: new_size=128, 512px — the
reference face workload's camera-grid/image resolution) — pair with the
reference budget ``--epochs 10 --inner-steps 200`` (5 hypotheses x 10
epochs x 200 inner steps, config_reconstruction_RenderNet.json:9,11-12)
for the trained reference-scale artifacts.

FULL-POSE RECOVERY RECIPE (round 5 — az 0.68 / el 0.17 deg, the
committed inverse_render_refscale_trained_r5.json):

    --halve-mode on_center --sequence-axes --warmup-freeze-epochs 8
    --epochs 12

i.e. axis-sequenced pattern search over FROZEN texture/light (per-arm
losses are then the static pose landscape, which ranks elevation
correctly — docs/performance.md "elevation recovered"), then unfrozen
epochs recover light/color. The default flags reproduce the reference's
schedule semantics instead.

Usage: python examples/reconstruct_trained.py [--arch tiny|mid]
       [--epochs 6] [--inner-steps 60] [--out DIR] [--json PATH]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "assets")
GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", choices=("tiny", "mid"), default="tiny")
    p.add_argument("--out", type=str, default="/tmp/rendernet_recon_trained")
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--inner-steps", type=int, default=60)
    p.add_argument("--json", type=str, default="")
    p.add_argument("--compute-dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--pose-eta", type=float, default=0.02)
    p.add_argument("--theta-range0", type=float, default=30.0,
                   help="initial elevation box (deg). 0 = no elevation "
                        "hypotheses: the box ranks azimuth (strongly "
                        "observable from the silhouette) and elevation "
                        "refines by gradient alone — useful because "
                        "adapted texture/light can compensate small "
                        "elevation errors, making the el corner pick "
                        "unreliable at ranking time")
    p.add_argument("--el-eta-scale", type=float, default=1.0,
                   help="multiplier on the elevation pose-gradient "
                        "component (ReconConfig.el_eta_scale): the el "
                        "gradient is ~20x weaker than azimuth's through "
                        "the trained nets")
    p.add_argument("--halve-mode", choices=("always", "on_center"),
                   default="always",
                   help="box-shrink policy (ReconConfig.halve_mode)")
    p.add_argument("--sequence-axes", action="store_true",
                   help="azimuth-first box search: theta opens at full "
                        "range on the first center win "
                        "(ReconConfig.sequence_axes; needs on_center)")
    p.add_argument("--warmup-freeze-epochs", type=int, default=0,
                   help="epochs with texture/light etas zeroed so the box "
                        "search ranks POSE alone "
                        "(ReconConfig.warmup_freeze_epochs)")
    p.add_argument("--tex-eta", type=float, default=0.1,
                   help="kept low: the 64^3 texture field can paint away "
                        "geometry error, confounding the pose ranking")
    p.add_argument("--resample", choices=("auto", "exact", "multipass"),
                   default="auto",
                   help="recon render warp. auto = multipass for the mid "
                        "(512px) net — the exact gather program at 512px "
                        "is pathological on TPU (and crashed the worker "
                        "in round 4) — exact for tiny (r3 comparability)")
    p.add_argument("--light-init", choices=("mid", "linspace"), default="mid",
                   help="'mid': all hypotheses start at the light-prior "
                        "midpoint so epoch-0 loss ranks POSE alone; "
                        "'linspace': the reference's spread "
                        "(Reconstruct_RenderNet_Face.py:461-465), which "
                        "conflates light and pose in the ranking")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.io import load_binvox
    from rendernet_tpu.models.texture_face import (
        TextureFaceConfig,
        texture_face_forward,
    )
    from rendernet_tpu.ops.phong import generate_light_pos, phong_composite
    from rendernet_tpu.recon import Latents, ReconConfig, ReconModel, reconstruct
    from rendernet_tpu.train.checkpoint import load_params_npz
    from rendernet_tpu.utils.image import save_image, to_uint8

    with open(os.path.join(ASSETS, f"texture_{args.arch}_arch.json")) as f:
        arch = {k: tuple(v) if isinstance(v, list) else v
                for k, v in json.load(f).items()}
    net_cfg = TextureFaceConfig(**arch)
    params = load_params_npz(
        os.path.join(ASSETS, f"texture_{args.arch}_face.npz")
    )
    vox = load_binvox("/root/reference/binvox/chair.binvox").astype(np.float32)

    # Ground truth latents. Pose sits inside the initial search box
    # (reference: box center/ranges are config priors). Light elevation is
    # fixed, azimuth trainable — tf_generate_light_pos semantics. The GT
    # texture code is a TRAINING identity's committed beta: the tiny net
    # saw only 5 identities, so an arbitrary 199-d code is far out of
    # distribution and renders garbage (the reference's decoders, trained
    # on the full Basel-face beta distribution, accept arbitrary codes).
    true_az, true_el = 255.0, 8.0
    true_light_az = 280.0
    light_elev = (90 - 105) * math.pi / 180.0
    beta_path = (os.path.join(GOLDEN, "texture_tiny_beta1.npy")
                 if args.arch == "tiny"
                 else os.path.join(ASSETS, "texture_mid_beta1.npy"))
    true_beta = np.load(beta_path).reshape(1, -1).astype(np.float32)

    cfg = ReconConfig(
        z_dim=8,  # unused by the loss (no shape decoder); keep tiny
        batch_size=5,
        inner_steps=args.inner_steps,
        max_epochs=args.epochs,
        new_size=net_cfg.new_size,
        compute_dtype=args.compute_dtype,
        light_elevation=light_elev,
        theta_range0=args.theta_range0,
        pose_eta=args.pose_eta,
        el_eta_scale=args.el_eta_scale,
        halve_mode=args.halve_mode,
        sequence_axes=args.sequence_axes,
        warmup_freeze_epochs=args.warmup_freeze_epochs,
        tex_eta=args.tex_eta,
        light_eta=0.1,
        shape_eta=0.0,
    )

    b = cfg.batch_size
    vox_b = jnp.asarray(
        np.broadcast_to(vox[None, :, :, :, None], (b,) + vox.shape + (1,))
    )

    resample = (args.resample if args.resample != "auto"
                else ("multipass" if args.arch == "mid" else "exact"))

    def render(latents: Latents) -> jnp.ndarray:
        albedo, normal = texture_face_forward(
            params, vox_b[: latents.pose.shape[0]], latents.texture,
            latents.pose, net_cfg, compute_dtype=jnp.bfloat16
            if cfg.compute_dtype == "bfloat16" else jnp.float32,
            resample=resample,
        )
        n = latents.pose.shape[0]
        light_dir = generate_light_pos(latents.light, cfg.light_elevation, n)
        shading = phong_composite(
            normal, light_dir, jnp.ones((n, 3), jnp.float32), cfg.ambient,
            cfg.k_diffuse, black_background=False, with_mask=True,
        )
        return albedo * shading

    def loss_fn(model, latents, target, cfg_):
        compos = render(latents)
        return jnp.mean((target - compos) ** 2, axis=(1, 2, 3))

    true_latents = Latents(
        vector=jnp.zeros((1, cfg.z_dim), jnp.float32),
        pose=jnp.asarray(np.array(
            [[math.radians(true_az), math.radians(true_el), 1.0]], np.float32
        )),
        texture=jnp.asarray(true_beta),
        light=jnp.asarray(np.array(
            [[math.radians(true_light_az)]], np.float32
        )),
    )
    target1 = render(true_latents)
    target = jnp.tile(target1, (b, 1, 1, 1))

    os.makedirs(args.out, exist_ok=True)
    save_image(to_uint8(np.asarray(target1[0]), 255.0),
               os.path.join(args.out, "target.png"))

    def errs(latents, i):
        d_az = abs(math.degrees(float(latents.pose[i, 0])) - true_az) % 360.0
        d_az = min(d_az, 360.0 - d_az)
        d_el = abs(math.degrees(float(latents.pose[i, 1])) - true_el)
        d_li = abs(math.degrees(float(latents.light[i, 0])) - true_light_az) % 360.0
        return d_az, d_el, min(d_li, 360.0 - d_li)

    epochs_log = []

    def log(epoch, latents, losses):
        i = int(np.argmin(np.asarray(losses)))
        d_az, d_el, d_li = errs(latents, i)
        rec = {
            "epoch": epoch,
            "best_loss": float(losses[i]),
            "pose_err_az_deg": round(d_az, 3),
            "pose_err_el_deg": round(d_el, 3),
            "light_err_deg": round(d_li, 3),
        }
        epochs_log.append(rec)
        print(json.dumps(rec), flush=True)

    from rendernet_tpu.recon import initial_latents

    init = initial_latents(cfg)
    if args.light_init == "mid":
        init = init._replace(
            light=jnp.full_like(init.light, float(jnp.mean(init.light)))
        )
    # One shared texture draw across hypotheses: with albedo color a strong
    # function of the code, per-hypothesis random codes would add ranking
    # noise unrelated to pose (the quantity the epoch-0 box search ranks).
    init = init._replace(
        texture=jnp.tile(init.texture[:1], (cfg.batch_size, 1))
    )

    t0 = time.time()
    latents, history, curves = reconstruct(
        ReconModel(decoder={}, texture={}, renderer={}), target, cfg,
        callback=log, loss_fn=loss_fn, initial=init,
    )
    wall = time.time() - t0
    best = int(np.argmin(np.asarray(history[-1])))
    recovered = render(latents)
    save_image(to_uint8(np.asarray(recovered[best]), 255.0),
               os.path.join(args.out, "recovered.png"))

    d_az, d_el, d_li = errs(latents, best)
    img_l1 = float(jnp.mean(jnp.abs(recovered[best] - target1[0])))
    # Recovered-color error: the 199-d code is underdetermined; what the
    # workload must recover is the IDENTITY COLOR it encodes.
    from rendernet_tpu.data.synthetic import beta_to_rgb

    col_err = float(np.abs(
        beta_to_rgb(np.asarray(latents.texture[best]))
        - beta_to_rgb(true_beta)
    ).mean())
    result = {
        "bench": f"reconstruct_trained_{args.arch}",
        "backend": jax.default_backend(),
        "img_res": 4 * net_cfg.new_size,
        "budget": [cfg.batch_size, cfg.max_epochs, cfg.inner_steps],
        "compute_dtype": cfg.compute_dtype,
        "wall_s": round(wall, 1),
        "final": {
            "pose_err_az_deg": round(d_az, 3),
            "pose_err_el_deg": round(d_el, 3),
            "light_err_deg": round(d_li, 3),
            "albedo_color_err": round(col_err, 5),
            "img_l1": round(img_l1, 5),
        },
        "epochs": epochs_log,
        "loss_curve_every10": [
            round(float(np.min(curves[e, s])), 6)
            for e in range(curves.shape[0])
            for s in range(0, curves.shape[1], 10)
        ],
    }
    out_json = args.json or os.path.join(args.out, "result.json")
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(f"pose err az {d_az:.2f} el {d_el:.2f} deg, light {d_li:.2f} deg, "
          f"color {col_err:.4f}, img L1 {img_l1:.5f} -> {out_json}")


if __name__ == "__main__":
    main()
