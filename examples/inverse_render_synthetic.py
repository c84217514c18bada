"""End-to-end inverse rendering without pretrained weights.

Synthesizes a target image from KNOWN latents (shape z, pose, texture,
light) through the frozen recon pipeline, then runs the coarse-to-fine
gradient search (`rendernet_tpu.recon.reconstruct`) from scratch and
reports how well the pose and image were recovered — the
Reconstruct_RenderNet_Face.py capability demonstrated self-contained
(the released npz weights are not redistributable; with them, use
`python -m rendernet_tpu.cli reconstruct config.json`).

The ground-truth pose sits inside the initial coarse-to-fine search box
(phi_mid0/theta_mid0) — the reference makes the same assumption: its box
center/ranges are config inputs (config_reconstruction_RenderNet.json),
i.e. pose priors, and the search subdivides within them (:458-473).

Reference scale = `--new-size 128 --inner-steps 200 --epochs 10`
(5 hypotheses x 10 epochs x 200 steps at 512px,
Reconstruct_RenderNet_Face.py:458-493); writes a results JSON with
per-epoch best loss + pose error (deg) and the final image L1.

Usage: python examples/inverse_render_synthetic.py [--epochs N] [--out DIR]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/rendernet_inverse_demo")
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--inner-steps", type=int, default=40)
    p.add_argument("--new-size", type=int, default=32,
                   help="camera grid depth (32 keeps CPU runtime sane; "
                        "128 is the reference scale)")
    p.add_argument("--z-dim", type=int, default=16)
    p.add_argument("--compute-dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--json", type=str, default="",
                   help="also write the results JSON here")
    p.add_argument("--scan-chunk", type=int, default=0,
                   help="run the inner loop as chunked scans of this many "
                        "steps (must divide --inner-steps; smaller chunks "
                        "compile a 4x smaller program — the monolithic "
                        "200-step scan at reference scale has crashed the "
                        "tunneled TPU worker)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.models.decoders import (
        init_recon_rendernet_params,
        init_recon_texture_decoder_params,
        init_shape_decoder_params,
    )
    from rendernet_tpu.recon import (
        Latents,
        ReconConfig,
        ReconModel,
        make_recon_step,
        recon_forward,
        reconstruct,
    )
    from rendernet_tpu.utils.image import save_image, to_uint8

    os.makedirs(args.out, exist_ok=True)
    cfg = ReconConfig(
        z_dim=args.z_dim,
        batch_size=5,
        inner_steps=args.inner_steps,
        max_epochs=args.epochs,
        new_size=args.new_size,
        compute_dtype=args.compute_dtype,
        light_elevation=(90 - 105) * math.pi / 180.0,
        shape_eta=0.1,
        pose_eta=0.001,
        tex_eta=0.1,
        light_eta=0.05,
    )
    model = ReconModel(
        decoder=init_shape_decoder_params(jax.random.PRNGKey(0), z_dim=cfg.z_dim),
        texture=init_recon_texture_decoder_params(jax.random.PRNGKey(1)),
        renderer=init_recon_rendernet_params(jax.random.PRNGKey(2),
                                             new_size=cfg.new_size),
    )

    # Ground truth: one latent set, rendered to the target image. The pose
    # lies inside the initial search box (az 255 deg vs phi_mid0 270+-30;
    # elevation 8 deg vs theta_mid0 90 -> elevations -15..15).
    rng = np.random.default_rng(7)
    true_pose = np.array(
        [[255.0 * math.pi / 180.0, 8.0 * math.pi / 180.0, 1.0]], np.float32
    )
    true = Latents(
        vector=jnp.asarray(rng.standard_normal((1, cfg.z_dim)).astype(np.float32)),
        pose=jnp.asarray(true_pose),
        texture=jnp.asarray(rng.standard_normal((1, 199)).astype(np.float32) * 0.3),
        light=jnp.asarray(np.array([[1.1]], np.float32)),
    )
    target = recon_forward(model, true, cfg)[0]
    save_image(to_uint8(np.asarray(target[0]), 255.0),
               os.path.join(args.out, "target.png"))

    chunk = args.scan_chunk or cfg.inner_steps
    run = make_recon_step(model, cfg, scan_steps=chunk)

    def pose_err_deg(pose_row):
        """(azimuth err, elevation err) in degrees; azimuth wraps mod 360."""
        d = (np.asarray(pose_row) - true_pose[0]) * 180.0 / math.pi
        az = abs(float(d[0])) % 360.0
        return min(az, 360.0 - az), abs(float(d[1]))

    epochs_log = []

    def log(epoch, latents, losses):
        i = int(np.argmin(np.asarray(losses)))
        az_err, el_err = pose_err_deg(latents.pose[i])
        rec = {
            "epoch": epoch,
            "best_loss": float(losses[i]),
            "best_pose": [round(float(x), 5) for x in np.asarray(latents.pose[i])],
            "pose_err_az_deg": round(az_err, 3),
            "pose_err_el_deg": round(el_err, 3),
        }
        epochs_log.append(rec)
        print(f"epoch {epoch}: best loss {rec['best_loss']:.6f} "
              f"pose err az {az_err:.2f} el {el_err:.2f} deg", flush=True)

    t0 = time.time()
    target_batch = jnp.tile(target, (cfg.batch_size, 1, 1, 1))
    latents, history, curves = reconstruct(
        model, target_batch, cfg, callback=log, run=run,
        dump_every=args.scan_chunk or None,
    )
    wall = time.time() - t0
    best = int(np.argmin(np.asarray(history[-1])))
    recovered = recon_forward(model, latents, cfg)[0]
    save_image(to_uint8(np.asarray(recovered[best]), 255.0),
               os.path.join(args.out, "recovered.png"))

    az_err, el_err = pose_err_deg(latents.pose[best])
    img_err = float(jnp.mean(jnp.abs(recovered[best] - target[0])))
    scale_err = abs(float(latents.pose[best][2]) - float(true_pose[0][2]))
    result = {
        "bench": "inverse_render_synthetic",
        "backend": jax.default_backend(),
        "new_size": cfg.new_size,
        "img_res": 4 * cfg.new_size,
        "budget": [cfg.batch_size, cfg.max_epochs, cfg.inner_steps],
        "compute_dtype": cfg.compute_dtype,
        "wall_s": round(wall, 1),
        "true_pose": [round(float(x), 5) for x in true_pose[0]],
        "final": {
            "pose_err_az_deg": round(az_err, 3),
            "pose_err_el_deg": round(el_err, 3),
            "scale_err": round(scale_err, 5),
            "img_l1": round(img_err, 5),
        },
        "epochs": epochs_log,
        # best-hypothesis loss every 10 inner steps, flattened over epochs
        "loss_curve_every10": [
            round(float(np.min(curves[e, s])), 6)
            for e in range(curves.shape[0])
            for s in range(0, curves.shape[1], 10)
        ],
    }
    out_json = os.path.join(args.out, "result.json")
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
    print(f"pose error az {az_err:.2f} deg, el {el_err:.2f} deg, "
          f"scale {scale_err:.4f}")
    print(f"image mean-L1 vs target: {img_err:.5f}")
    print(f"wrote {args.out}/target.png, recovered.png, result.json")


if __name__ == "__main__":
    main()
