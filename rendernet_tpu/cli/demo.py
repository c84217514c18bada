"""Phong-shading inference demo CLI.

Capability-parity target: ``RenderNet_demo.py`` — load a pretrained shader
net, read a 64^3 binvox, render a normal map for a (azimuth, elevation,
radius) pose, Phong-composite with CLI-controlled lighting on the host, save
PNG; ``--rotate`` sweeps azimuth 0..360 step 5.

Weights come from either a single ``.npz`` of our param paths or a
reference-format directory of ``*.txt.npz`` files (``--weights``). Without
weights, a seeded random network runs (pipeline smoke mode).
"""
from __future__ import annotations

import argparse
import math
import os

import numpy as np

AMBIENT_IN = 0.1
K_DIFFUSE = 0.9
LIGHT_COL = np.array([[1.0, 1.0, 1.0]])


def compute_pose_param(azimuth, elevation, radius):
    """Degrees/radius -> (azimuth_rad, theta_rad, scale) (RenderNet_demo.py:33)."""
    phi = azimuth * math.pi / 180.0
    theta = (90 - elevation) * math.pi / 180.0
    return np.array([[phi, theta, 3.3 / radius]], np.float32)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("--voxel_path", type=str, default="/root/reference/binvox/chair.binvox")
    p.add_argument("--azimuth", type=float, default=250)
    p.add_argument("--elevation", type=float, default=60)
    p.add_argument("--light_azimuth", type=float, default=250)
    p.add_argument("--light_elevation", type=float, default=60)
    p.add_argument("--radius", type=float, default=3.3)
    p.add_argument("--render_dir", type=str, default="./render")
    p.add_argument("--rotate", action="store_true",
                   help="render a full 360-degree azimuth sweep (step 5)")
    p.add_argument("--sweep_batch", type=int, default=8,
                   help="frames per device batch in --rotate sweeps (the "
                        "reference renders one frame per session run, "
                        "RenderNet_demo.py:130-137; batching fills the MXU)")
    p.add_argument("--gif", type=str, default="",
                   help="with --rotate: also write the sweep as a GIF here")
    p.add_argument("--weights", type=str, default="",
                   help=".npz params file or reference *.txt.npz weight dir")
    p.add_argument("--frozen", type=str, default="",
                   help="frozen StableHLO artifact from `convert freeze` "
                        "(no model code or weights needed — the reference's "
                        "frozen-.pb demo path, RenderNet_demo.py:23-30)")
    # default=None so explicitness is detectable via argparse itself (a
    # raw-argv scan misses prefix abbreviations like "--out_chan 4"); the
    # effective default of 3 is applied after the --arch conflict check.
    p.add_argument("--out_channels", type=int, default=None,
                   help="shader head channels (3 = normal-map demo net; "
                        "default 3)")
    p.add_argument("--arch", type=str, default="",
                   help="ShaderConfig overrides as a JSON file or inline "
                        "JSON (e.g. '{\"base\": 4, \"new_size\": 64}') — "
                        "lets --weights load reduced architectures such as "
                        "the committed showcase net assets/shader_tiny*")
    p.add_argument("--fast", action="store_true",
                   help="route the wide res-stack convs through the fused "
                        "Winograd kernel: +22-30%% batched render "
                        "throughput on TPU at sweep batches >= 8 "
                        "(serving_bench_r5.json; the b>=8 envelope gate "
                        "keeps single frames on the XLA path). Renders "
                        "differ from the default path only by ~0.5%% "
                        "bf16 transform rounding — the same forward the "
                        "training-quality gate PASSED")
    p.add_argument("--resample", type=str, default="exact",
                   choices=["exact", "multipass"],
                   help="voxel resample kernel: exact trilinear (reference "
                        "bit-parity) or the fast multipass Pallas kernel")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.fast:
        from rendernet_tpu.nn import layers

        layers.WINOGRAD_2D = "pallas"

    from rendernet_tpu.io import binvox as binvox_rw
    from rendernet_tpu.models.shader import ShaderConfig, init_shader_params, shader_forward
    from rendernet_tpu.ops.phong import np_generate_light_pos, np_phong_composite
    from rendernet_tpu.utils.image import save_gif, save_image, to_uint8

    arch = {}
    if args.arch:
        import dataclasses
        import json

        text = args.arch
        if os.path.exists(text):
            with open(text) as f:
                text = f.read()
        arch = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in json.loads(text).items()
        }
        bad = set(arch) - {f.name for f in dataclasses.fields(ShaderConfig)}
        if bad:
            raise SystemExit(f"--arch: unknown ShaderConfig fields {sorted(bad)}")
        if ("out_channels" in arch and args.out_channels is not None
                and arch["out_channels"] != args.out_channels):
            raise SystemExit(
                f"--out_channels {args.out_channels} conflicts with the --arch "
                f"file's out_channels={arch['out_channels']}; drop one"
            )
    out_channels = 3 if args.out_channels is None else args.out_channels
    cfg = ShaderConfig(**{"out_channels": out_channels, **arch})
    if args.frozen:
        from rendernet_tpu.compat import load_frozen

        if args.weights:
            print("NOTE: --frozen overrides --weights (the artifact's baked-in "
                  "params are used)")
        if args.resample != "exact":
            print("NOTE: --frozen ignores --resample (the artifact's pipeline "
                  "was fixed at freeze time)")
        exported = load_frozen(args.frozen)
        params = None
        render_from = jax.jit(exported.call)
    elif args.weights:
        from rendernet_tpu.compat import load_reference_weight_dir, params_from_weight_dict
        from rendernet_tpu.train.checkpoint import load_params_npz

        template = init_shader_params(jax.random.PRNGKey(0), cfg)
        if os.path.isdir(args.weights):
            params = params_from_weight_dict(
                template, load_reference_weight_dir(args.weights), strict=False
            )
        else:
            params = load_params_npz(args.weights)
    else:
        print("NOTE: no --weights given; rendering with a seeded random net")
        params = init_shader_params(jax.random.PRNGKey(0), cfg)

    os.makedirs(args.render_dir, exist_ok=True)
    with open(args.voxel_path, "rb") as f:
        voxel = np.reshape(
            binvox_rw.read_as_3d_array(f).data.astype(np.float32), (1, 64, 64, 64, 1)
        )
    model_name = os.path.basename(args.voxel_path).split(".binvox")[0]
    light_dir = np_generate_light_pos(args.light_elevation, args.light_azimuth)

    if args.frozen:
        render_fn = lambda p, v, q: render_from(v, q)  # noqa: E731
    else:
        render_fn = jax.jit(
            lambda p, v, q: shader_forward(p, v, q, cfg, resample=args.resample)
        )

    vox_cache = {}  # batch size -> device-resident tiled voxel

    def render_batch(azimuths, counts):
        """Render a batch of azimuths in one device dispatch. One jit
        specialization per batch size; sweeps pad the tail to keep it to
        two executables (full + remainder). The tiled voxel batch is
        uploaded once per batch size, not per chunk."""
        poses = jnp.asarray(
            np.concatenate(
                [compute_pose_param(a, args.elevation, args.radius) for a in azimuths]
            )
        )
        if len(azimuths) not in vox_cache:
            vox_cache[len(azimuths)] = jnp.asarray(
                np.repeat(voxel, len(azimuths), axis=0)
            )
        vox_b = vox_cache[len(azimuths)]
        normal_maps = np.asarray(render_fn(params, vox_b, poses))
        if normal_maps.shape[-1] == 1:
            imgs = normal_maps[:, :, :, 0]
        else:
            imgs = np_phong_composite(
                normal_maps, light_dir, LIGHT_COL, AMBIENT_IN, K_DIFFUSE
            )
        out = []
        for azimuth, count, img in zip(azimuths, counts, imgs):
            if count is None:  # tail padding
                continue
            name = (
                f"{count:03d}_{model_name}_pose_{azimuth:f}_{args.elevation:f}_"
                f"{args.radius:f}_light_{args.light_azimuth:f}_{args.light_elevation:f}.png"
            )
            path = os.path.join(args.render_dir, name)
            save_image(to_uint8(img, 255.0), path)
            print(path)
            out.append(img)
        return out

    if args.rotate:
        # Frozen artifacts have a fixed batch (from `convert freeze
        # --batch`); live nets batch the sweep by --sweep_batch.
        bs = exported.in_avals[0].shape[0] if args.frozen else max(1, args.sweep_batch)
        azimuths = [float(a) for a in np.arange(0.0, 360.0, 5.0)]
        frames = []
        for start in range(0, len(azimuths), bs):
            chunk = azimuths[start : start + bs]
            counts = list(range(start, start + len(chunk)))
            while len(chunk) < bs:  # pad tail: reuse the last pose
                chunk = chunk + [chunk[-1]]
                counts = counts + [None]
            frames.extend(render_batch(chunk, counts))
        if args.gif:
            save_gif([to_uint8(f, 255.0) for f in frames], args.gif)
            print(args.gif)
    else:
        chunk, counts = [args.azimuth], [0]
        if args.frozen:  # pad to the artifact's fixed batch
            n = exported.in_avals[0].shape[0]
            chunk = chunk + [args.azimuth] * (n - 1)
            counts = counts + [None] * (n - 1)
        render_batch(chunk, counts)


if __name__ == "__main__":
    main()
