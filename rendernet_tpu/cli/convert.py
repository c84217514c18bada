"""Weight/checkpoint conversion CLI (demo/RenderNet_converter.py analog).

Subcommands:
  ckpt-to-npz   — Orbax TrainState checkpoint -> single .npz params archive
                  (the deployment freeze: a jitted fn + this npz is the
                  export story, replacing the TF frozen GraphDef).
  npz-to-refdir — our .npz archive -> reference-format *.txt.npz directory.
  refdir-to-npz — reference weight dir -> our .npz archive (requires the
                  matching --model to derive param paths).
  freeze        — params (.npz or reference weight dir) -> portable frozen
                  StableHLO artifact with the weights baked in as constants
                  (the demo/RenderNet_converter.py:3-18 frozen-.pb analog;
                  load with compat.load_frozen, run via .call).
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c1 = sub.add_parser("ckpt-to-npz")
    c1.add_argument("checkpoint", type=str)
    c1.add_argument("out", type=str)

    c2 = sub.add_parser("npz-to-refdir")
    c2.add_argument("npz", type=str)
    c2.add_argument("out_dir", type=str)

    c3 = sub.add_parser("refdir-to-npz")
    c3.add_argument("weight_dir", type=str)
    c3.add_argument("out", type=str)
    c3.add_argument("--model", type=str, default="shader",
                    choices=["shader", "texture", "recon-renderer",
                             "shape-decoder", "recon-texture"])

    c5 = sub.add_parser("pb-to-npz")
    c5.add_argument("pb", type=str,
                    help="frozen GraphDef (the reference's released format)")
    c5.add_argument("out", type=str)
    c5.add_argument("--model", type=str, default="shader",
                    choices=["shader", "texture", "recon-renderer",
                             "shape-decoder", "recon-texture"])
    c5.add_argument("--out_channels", type=int, default=3,
                    help="shader head width (the released demo pb is the "
                         "3-channel normal-map net)")
    c5.add_argument("--allow-missing", action="store_true",
                    help="tolerate params the pb doesn't provide (they keep "
                         "random template init; a WARNING reports the count)")

    c4 = sub.add_parser("freeze")
    c4.add_argument("weights", type=str,
                    help=".npz params file or reference *.txt.npz weight dir")
    c4.add_argument("out", type=str)
    c4.add_argument("--batch", type=int, default=1)
    c4.add_argument("--voxel_size", type=int, default=64)
    c4.add_argument("--out_channels", type=int, default=3)
    c4.add_argument("--platforms", type=str, default="cpu,tpu",
                    help="comma-separated lowering targets")
    return p


def _template(model: str):
    import jax

    key = jax.random.PRNGKey(0)
    if model == "shader":
        from rendernet_tpu.models.shader import ShaderConfig, init_shader_params

        return init_shader_params(key, ShaderConfig())
    if model == "texture":
        from rendernet_tpu.models.texture_face import (
            TextureFaceConfig,
            init_texture_face_params,
        )

        return init_texture_face_params(key, TextureFaceConfig())
    if model == "recon-renderer":
        from rendernet_tpu.models.decoders import init_recon_rendernet_params

        return init_recon_rendernet_params(key)
    if model == "shape-decoder":
        from rendernet_tpu.models.decoders import init_shape_decoder_params

        return init_shape_decoder_params(key)
    from rendernet_tpu.models.decoders import init_recon_texture_decoder_params

    return init_recon_texture_decoder_params(key)


def main(argv=None):
    args = build_parser().parse_args(argv)

    from rendernet_tpu.compat import (
        export_reference_weight_dir,
        load_reference_weight_dir,
        params_from_weight_dict,
    )
    from rendernet_tpu.train.checkpoint import (
        load_params_npz,
        restore_checkpoint,
        save_params_npz,
    )

    if args.cmd == "freeze":
        import os as _os

        from rendernet_tpu.compat import freeze_shader_render, save_frozen
        from rendernet_tpu.models.shader import ShaderConfig

        cfg = ShaderConfig(out_channels=args.out_channels)
        if _os.path.isdir(args.weights):
            import jax as _jax

            from rendernet_tpu.models.shader import init_shader_params

            template = init_shader_params(_jax.random.PRNGKey(0), cfg)
            params = params_from_weight_dict(
                template, load_reference_weight_dir(args.weights), strict=False
            )
        else:
            params = load_params_npz(args.weights)
        exported = freeze_shader_render(
            params, cfg, batch=args.batch, voxel_size=args.voxel_size,
            platforms=tuple(p.strip() for p in args.platforms.split(",")),
        )
        save_frozen(exported, args.out)
        print(f"froze shader render ({args.platforms}) to {args.out}")
    elif args.cmd == "ckpt-to-npz":
        # Checkpoints store numbered leaves; training runs also write a
        # params npz next to them — prefer that when present.
        import os as _os

        sibling = _os.path.join(_os.path.dirname(args.checkpoint), "params_latest.npz")
        if _os.path.exists(sibling):
            params = load_params_npz(sibling)
        else:
            data = restore_checkpoint(args.checkpoint)
            params = {k: v for k, v in data.items()}
        save_params_npz(args.out, params)
        print(f"wrote {len(params)} entries to {args.out}")
    elif args.cmd == "npz-to-refdir":
        params = load_params_npz(args.npz)
        export_reference_weight_dir(params, args.out_dir)
        print(f"wrote {len(params)} weight files to {args.out_dir}")
    elif args.cmd == "pb-to-npz":
        from rendernet_tpu.compat import params_from_frozen_pb

        if args.model == "shader":
            import jax as _jax

            from rendernet_tpu.models.shader import ShaderConfig, init_shader_params

            template = init_shader_params(
                _jax.random.PRNGKey(0),
                ShaderConfig(out_channels=args.out_channels),
            )
        else:
            template = _template(args.model)
        params = params_from_frozen_pb(template, args.pb,
                                       strict=not args.allow_missing)
        save_params_npz(args.out, params)
        print(f"wrote {len(params)} params to {args.out}")
    else:
        template = _template(args.model)
        wd = load_reference_weight_dir(args.weight_dir)
        params = params_from_weight_dict(template, wd, strict=False)
        save_params_npz(args.out, params)
        print(f"wrote {len(params)} params to {args.out}")


if __name__ == "__main__":
    main()
