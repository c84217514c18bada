"""Diagnostic: per-arm (az, el, light, loss) trajectories of the refscale
coarse-to-fine search through the trained mid net (small budget, TPU).

This is the tool that cracked the round-5 elevation stall (committed
log excerpt in docs/design.md): it showed AZIMUTH recovers by arm
SELECTION (the +-phi_range/2 arm wins epoch 1; the gradient only fine-
tunes), and because every phi arm carries theta_mid, the winner always
inherits the center's (wrong) elevation. Elevation selection only
starts working once azimuth is right (epoch 2+ - the el arm then beats
the center by ~8-15% loss), but the reference's lockstep range halving
(:458-473) has already shrunk the theta box twice by then.
ReconConfig.halve_mode="on_center" (pattern search: shrink only when
the CENTER wins) keeps each axis's resolution until that axis has
actually been resolved. Usage: python benchmarks/recon_arm_diag.py
"""
import json, math, sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rendernet_tpu.io import load_binvox
from rendernet_tpu.models.texture_face import (
    TextureFaceConfig, texture_face_forward,
)
from rendernet_tpu.ops.phong import generate_light_pos, phong_composite
from rendernet_tpu.recon import (
    Latents, ReconConfig, ReconModel, initial_latents, reconstruct,
)
from rendernet_tpu.train.checkpoint import load_params_npz

A = "/root/repo/assets"
arch = {k: tuple(v) if isinstance(v, list) else v
        for k, v in json.load(open(A + "/texture_mid_arch.json")).items()}
net_cfg = TextureFaceConfig(**arch)
params = load_params_npz(A + "/texture_mid_face.npz")
vox = load_binvox("/root/reference/binvox/chair.binvox").astype(np.float32)
beta_true = np.load(A + "/texture_mid_beta1.npy").reshape(1, -1).astype(np.float32)

true_az, true_el, true_light = 255.0, 8.0, 280.0
light_elev = (90 - 105) * math.pi / 180.0

cfg = ReconConfig(
    z_dim=8, batch_size=5, inner_steps=100, max_epochs=4,
    new_size=net_cfg.new_size, compute_dtype="bfloat16",
    light_elevation=light_elev, theta_range0=30.0,
    pose_eta=0.02, tex_eta=0.1, light_eta=0.1, shape_eta=0.0,
)

b = cfg.batch_size
vox_b = jnp.asarray(np.broadcast_to(vox[None, :, :, :, None],
                                    (b,) + vox.shape + (1,)))

def render(latents):
    albedo, normal = texture_face_forward(
        params, vox_b[: latents.pose.shape[0]], latents.texture,
        latents.pose, net_cfg, compute_dtype=jnp.bfloat16,
        resample="multipass",
    )
    n = latents.pose.shape[0]
    light_dir = generate_light_pos(latents.light, cfg.light_elevation, n)
    shading = phong_composite(
        normal, light_dir, jnp.ones((n, 3), jnp.float32), 0.0, 1.0,
        black_background=False, with_mask=True,
    )
    return albedo * shading

def loss_fn(model, latents, target, cfg_):
    return jnp.mean((target - render(latents)) ** 2, axis=(1, 2, 3))

true_latents = Latents(
    vector=jnp.zeros((1, cfg.z_dim), jnp.float32),
    pose=jnp.asarray([[math.radians(true_az), math.radians(true_el), 1.0]],
                     jnp.float32),
    texture=jnp.asarray(beta_true),
    light=jnp.asarray([[math.radians(true_light)]], jnp.float32),
)
target1 = render(true_latents)
target = jnp.tile(target1, (b, 1, 1, 1))

rng = np.random.default_rng(0)
init = initial_latents(cfg)
init = init._replace(
    light=jnp.full_like(init.light, float(jnp.mean(init.light))),
    texture=jnp.tile(init.texture[:1], (b, 1)),
)

def cb(epoch, latents, losses):
    rec = {
        "epoch": epoch,
        "arms": [
            {
                "az": round(math.degrees(float(latents.pose[i, 0])) % 360, 2),
                "el": round(math.degrees(float(latents.pose[i, 1])), 2),
                "light": round(math.degrees(float(latents.light[i, 0])) % 360, 2),
                "loss": round(float(losses[i]), 6),
            }
            for i in range(b)
        ],
    }
    print(json.dumps(rec), flush=True)

reconstruct(ReconModel(decoder={}, texture={}, renderer={}), target, cfg,
            callback=cb, loss_fn=loss_fn, initial=init)
