"""End-to-end inverse rendering without pretrained weights.

Synthesizes a target image from KNOWN latents (shape z, pose, texture,
light) through the frozen recon pipeline, then runs the coarse-to-fine
gradient search (`rendernet_tpu.recon.reconstruct`) from scratch and
reports how well the pose and image were recovered — the
Reconstruct_RenderNet_Face.py capability demonstrated self-contained
(the released npz weights are not redistributable; with them, use
`python -m rendernet_tpu.cli reconstruct config.json`).

Usage: python examples/inverse_render_synthetic.py [--epochs N] [--out DIR]
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/rendernet_inverse_demo")
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--inner-steps", type=int, default=40)
    p.add_argument("--new-size", type=int, default=32,
                   help="camera grid depth (32 keeps CPU runtime sane; "
                        "128 is the reference scale)")
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
        z_dim=16,
        batch_size=5,
        inner_steps=args.inner_steps,
        max_epochs=args.epochs,
        new_size=args.new_size,
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

    # Ground truth: one latent set, rendered to the target image.
    rng = np.random.default_rng(7)
    true = Latents(
        vector=jnp.asarray(rng.standard_normal((1, cfg.z_dim)).astype(np.float32)),
        pose=jnp.asarray(np.array([[2.4, 0.35, 1.0]], np.float32)),
        texture=jnp.asarray(rng.standard_normal((1, 199)).astype(np.float32) * 0.3),
        light=jnp.asarray(np.array([[1.1]], np.float32)),
    )
    target = recon_forward(model, true, cfg)[0]
    save_image(to_uint8(np.asarray(target[0]), 255.0),
               os.path.join(args.out, "target.png"))

    run = make_recon_step(model, cfg, scan_steps=cfg.inner_steps)

    def log(epoch, latents, losses):
        i = int(np.argmin(np.asarray(losses)))
        print(f"epoch {epoch}: best loss {float(losses[i]):.6f} "
              f"pose {np.asarray(latents.pose[i])}")

    target_batch = jnp.tile(target, (cfg.batch_size, 1, 1, 1))
    latents, history, _ = reconstruct(model, target_batch, cfg, callback=log,
                                      run=run)
    best = int(np.argmin(np.asarray(history[-1])))
    recovered = recon_forward(model, latents, cfg)[0]
    save_image(to_uint8(np.asarray(recovered[best]), 255.0),
               os.path.join(args.out, "recovered.png"))

    pose_err = np.abs(np.asarray(latents.pose[best]) - np.asarray(true.pose[0]))
    img_err = float(jnp.mean(jnp.abs(recovered[best] - target[0])))
    print(f"pose error (az, el, scale): {pose_err}")
    print(f"image mean-L1 vs target: {img_err:.5f}")
    print(f"wrote {args.out}/target.png and recovered.png")


if __name__ == "__main__":
    main()
