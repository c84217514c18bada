"""Frozen StableHLO deployment artifacts (compat/frozen.py).

Capability-parity target: the reference's frozen-GraphDef deployment —
demo/RenderNet_converter.py:3-18 (freeze) + RenderNet_demo.py:23-30 (load
and run without model code).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from rendernet_tpu.compat import (
    freeze_fn,
    freeze_shader_render,
    load_frozen,
    save_frozen,
)
from rendernet_tpu.models.shader import ShaderConfig, init_shader_params, shader_forward


def test_freeze_fn_roundtrip(tmp_path, rng):
    w = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))

    def fn(x):
        return jnp.tanh(x @ w)  # w baked in as a constant

    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    exported = freeze_fn(fn, (x,), platforms=("cpu",))
    path = str(tmp_path / "fn.shlo")
    save_frozen(exported, path)
    loaded = load_frozen(path)

    np.testing.assert_allclose(
        np.asarray(loaded.call(x)), np.asarray(fn(x)), atol=1e-6
    )
    # The artifact composes into larger jitted programs.
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda x: loaded.call(x) * 2.0)(x)),
        np.asarray(fn(x)) * 2.0,
        atol=1e-6,
    )


def test_freeze_shader_render_matches_direct(tmp_path, rng):
    """Freezing the shader render bakes params in and reproduces the live
    pipeline bit-for-bit, through a file roundtrip, with no params passed
    at call time."""
    cfg = ShaderConfig(
        out_channels=1,
        enc_channels=(2, 2, 4),
        res1_blocks=1,
        res2_blocks=1,
        res3_blocks=1,
        base=2,
        new_size=16,
    )
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    exported = freeze_shader_render(
        params, cfg, batch=1, voxel_size=8, platforms=("cpu",)
    )
    path = str(tmp_path / "shader.shlo")
    save_frozen(exported, path)
    loaded = load_frozen(path)

    vox = jnp.asarray((rng.random((1, 8, 8, 8, 1)) > 0.6).astype(np.float32))
    pose = jnp.asarray(np.array([[1.2, 0.4, 1.0]], np.float32))
    got = np.asarray(loaded.call(vox, pose))
    want = np.asarray(shader_forward(params, vox, pose, cfg))
    assert got.shape == (1, 64, 64, 1)  # 4 * new_size (camera grid), fully conv
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cli_freeze_writes_loadable_artifact(tmp_path):
    """`convert freeze` on an npz produces an artifact whose input
    signature matches the reference demo's feeds (voxels + pose)."""
    from rendernet_tpu.cli import convert
    from rendernet_tpu.train.checkpoint import save_params_npz

    cfg = ShaderConfig(
        out_channels=1,
        enc_channels=(2, 2, 4),
        res1_blocks=1,
        res2_blocks=1,
        res3_blocks=1,
        base=2,
        new_size=16,
    )
    params = init_shader_params(jax.random.PRNGKey(1), cfg)
    npz = str(tmp_path / "params.npz")
    save_params_npz(npz, params)
    out = str(tmp_path / "frozen.shlo")

    # The CLI freezes the full-size ShaderConfig; monkey-free small run:
    # drive the library path the CLI wraps, then the CLI arg parsing only.
    exported = freeze_shader_render(params, cfg, batch=1, voxel_size=8,
                                    platforms=("cpu",))
    save_frozen(exported, out)
    assert os.path.getsize(out) > 0
    loaded = load_frozen(out)
    assert [tuple(a.shape) for a in loaded.in_avals] == [
        (1, 8, 8, 8, 1), (1, 3)
    ]
    assert "cpu" in [p.lower() for p in loaded.platforms]

    parser = convert.build_parser()
    args = parser.parse_args(["freeze", npz, out, "--batch", "2",
                              "--platforms", "cpu"])
    assert args.cmd == "freeze" and args.batch == 2


def test_freeze_multiplatform_lowering(tmp_path, rng):
    """One artifact carries both cpu and tpu lowerings (no TPU device
    needed at freeze time) and still executes on cpu."""
    w = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))

    exported = freeze_fn(lambda a: a @ w, (x,), platforms=("cpu", "tpu"))
    assert set(p.lower() for p in exported.platforms) == {"cpu", "tpu"}
    path = str(tmp_path / "mp.shlo")
    save_frozen(exported, path)
    loaded = load_frozen(path)
    np.testing.assert_allclose(
        np.asarray(loaded.call(x)), np.asarray(x @ w), atol=1e-6
    )
