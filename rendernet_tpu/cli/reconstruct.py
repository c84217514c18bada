"""Inverse-rendering CLI (Reconstruct_RenderNet_Face.py parity).

Reads the reconstruction JSON config, loads the three pretrained weight
sets (reference *.txt.npz dirs via --compat, or our .npz archives), builds
the shaded target from GT albedo+normal with host-side Phong, and runs the
coarse-to-fine latent optimization, dumping per-epoch results.
"""
from __future__ import annotations

import argparse
import math
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", type=str, help="reconstruction JSON config")
    p.add_argument("--random-weights", action="store_true",
                   help="use seeded random nets (pipeline smoke mode)")
    p.add_argument("--dump-every", type=int, default=100,
                   help="intermediate dump/log interval in inner steps "
                        "(reference dumps every 100: "
                        "Reconstruct_RenderNet_Face.py:497-519); 0 disables")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rendernet_tpu.compat import load_reference_weight_dir, params_from_weight_dict
    from rendernet_tpu.io import binvox as binvox_rw
    from rendernet_tpu.models.decoders import (
        init_recon_rendernet_params,
        init_recon_texture_decoder_params,
        init_shape_decoder_params,
    )
    from rendernet_tpu.ops.phong import np_phong_composite
    from rendernet_tpu.recon import ReconConfig, ReconModel, recon_forward, reconstruct
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.utils.image import decode_image, save_image, to_uint8

    cfg = TrainConfig.from_json(args.config)
    rcfg = ReconConfig(
        compute_dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
        z_dim=cfg.z_dim,
        batch_size=cfg.batch_size,
        inner_steps=cfg.inner_step,
        max_epochs=cfg.max_epochs,
        new_size=cfg.new_size,
        shape_eta=cfg.shape_eta,
        pose_eta=cfg.pose_eta,
        tex_eta=cfg.tex_eta,
        light_eta=cfg.light_eta,
        light_elevation=(90 - cfg.target_elevation_light) * math.pi / 180.0,
    )
    os.makedirs(cfg.sample_save, exist_ok=True)

    templates = ReconModel(
        decoder=init_shape_decoder_params(jax.random.PRNGKey(0), z_dim=rcfg.z_dim),
        texture=init_recon_texture_decoder_params(jax.random.PRNGKey(1)),
        renderer=init_recon_rendernet_params(jax.random.PRNGKey(2),
                                             new_size=rcfg.new_size),
    )
    if args.random_weights:
        model = templates
    else:
        wd_render = load_reference_weight_dir(cfg.weight_dir)
        wd_decoder = load_reference_weight_dir(cfg.weight_dir_decoder)
        model = ReconModel(
            decoder=params_from_weight_dict(templates.decoder, wd_decoder, strict=False),
            texture=params_from_weight_dict(templates.texture, wd_render, strict=False),
            renderer=params_from_weight_dict(templates.renderer, wd_render, strict=False),
        )

    # --- shaded target from GT albedo + normal (host-side Phong; :435-447) ---
    res = 4 * rcfg.new_size  # the renderer's output resolution (512 @ 128)

    def read_target(path):
        with open(path, "rb") as f:
            img = decode_image(f.read())[:, :, :3]
        if img.shape[:2] != (res, res):  # e.g. 512px reference assets, small grid
            from PIL import Image

            img = np.asarray(
                Image.fromarray(img).resize((res, res), Image.BILINEAR)
            )
        return img.reshape(1, res, res, 3) / 255.0

    target = read_target(cfg.target_albedo)
    target_normal = read_target(cfg.target_normal)

    elevation_gt = (90 - cfg.target_elevation_light) * math.pi / 180.0
    azimuth_gt = cfg.target_azimuth_light * math.pi / 180.0
    light_dir = np.array(
        [[
            np.sin(elevation_gt) * np.cos(azimuth_gt),
            np.sin(elevation_gt) * np.sin(azimuth_gt),
            np.cos(elevation_gt),
        ]]
    )
    light_col = np.array([[1.0, 1.0, 1.0]])
    shading = np_phong_composite(
        target_normal, light_dir, light_col, 0.0, 1.0,
        background_col="white", with_mask=True,
    )
    target_compos = target * shading
    save_image(to_uint8(target_compos[0], 255.0),
               os.path.join(cfg.sample_save, "shaded_target.png"))
    target_batch = jnp.asarray(
        np.tile(target_compos, (rcfg.batch_size, 1, 1, 1)), jnp.float32
    )

    metrics_path = os.path.join(cfg.sample_save, "metrics.jsonl")

    def log_metrics(**kv):
        import json

        with open(metrics_path, "a") as f:
            f.write(json.dumps(kv) + "\n")

    def dump(epoch, latents, losses):
        best = int(losses.argmin())
        compos, albedo, normal, shape = recon_forward(model, latents, rcfg)
        pose_deg = np.asarray(latents.pose[best]) * 180.0 / math.pi
        tag = (f"epoch{epoch}_p{pose_deg[0]:.1f}_t{90 - pose_deg[1]:.1f}"
               f"_loss{losses[best]:.5f}")
        save_image(to_uint8(np.asarray(compos[best]), 255.0),
                   os.path.join(cfg.sample_save, tag + ".png"))
        binvox_rw.save_binvox(
            np.asarray(shape[best]).reshape(64, 64, 64) > cfg.threshold,
            os.path.join(cfg.sample_save, tag + ".binvox"),
        )
        print(f"epoch {epoch}: best hypothesis {best} loss {losses[best]:.5f}")

    def inner_dump(epoch, inner_step, latents, losses_chunk):
        """Per-chunk observability (Reconstruct_RenderNet_Face.py:497-519):
        per-hypothesis losses into metrics.jsonl plus an intermediate
        best-hypothesis image/binvox dump at each chunk boundary."""
        final = losses_chunk[-1]
        best = int(final.argmin())
        log_metrics(epoch=epoch, inner_step=inner_step,
                    losses=[float(x) for x in final], best=best)
        if inner_step < rcfg.inner_steps:  # end-of-epoch handled by dump()
            compos, _, _, shape = recon_forward(model, latents, rcfg)
            tag = f"epoch{epoch}_step{inner_step}"
            save_image(to_uint8(np.asarray(compos[best]), 255.0),
                       os.path.join(cfg.sample_save, tag + ".png"))
            binvox_rw.save_binvox(
                np.asarray(shape[best]).reshape(64, 64, 64) > cfg.threshold,
                os.path.join(cfg.sample_save, tag + ".binvox"),
            )

    dump_every = args.dump_every if args.dump_every > 0 else None
    if dump_every is not None and rcfg.inner_steps % dump_every:
        dump_every = None  # fall back to one scan per epoch
    latents, history, curves = reconstruct(
        model, target_batch, rcfg, callback=dump,
        dump_every=dump_every,
        inner_callback=inner_dump if dump_every is not None else None,
    )
    # Full [epochs, inner_steps, B] per-hypothesis loss curves — the
    # reference's per-sample summary scalars (:415-416), in one artifact.
    np.savez(os.path.join(cfg.sample_save, "loss_history.npz"),
             final=history, curves=curves)
    print("Reconstruction done")


if __name__ == "__main__":
    main()
