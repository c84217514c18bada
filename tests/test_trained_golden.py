"""Golden-image regression + quality tests on the committed trained weights.

``assets/shader_tiny_silhouette.npz`` is a reduced-width shader RenderNet
(same topology as RenderNet_Shader.py:32-131; arch in
``assets/shader_tiny_arch.json``) trained on self-rendered silhouette data
by ``examples/train_tiny_shader.py``. These tests pin the whole inference
stack end to end:

  * regression: a fixed render must match the committed golden image —
    any numeric drift anywhere in binvox I/O, pose math, exact resample,
    axis alignment, or the conv/PReLU/deconv stack moves the pixels;
  * quality: the trained net must actually render the (held-out pose)
    silhouette it was trained to produce, so the committed artifact stays
    a real trained model, not noise.

The reference has no analog (no tests, no committed weights); this stands
in for the unfetchable released-weights parity gate at reduced scale.
"""
import json
import os

import numpy as np
import pytest

ASSETS = os.path.join(os.path.dirname(__file__), os.pardir, "assets")
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# (azimuth_deg, theta_deg, radius) in the training-filename convention:
# pose elevation = 90 - theta (data/pose.py). theta=60 -> elevation 30 deg.
POSE_DEG = (250.0, 60.0, 3.3)


@pytest.fixture(scope="module")
def tiny_net():
    import jax

    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.checkpoint import load_params_npz

    with open(os.path.join(ASSETS, "shader_tiny_arch.json")) as f:
        arch = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in json.load(f).items()
        }
    cfg = ShaderConfig(**arch)
    params = load_params_npz(os.path.join(ASSETS, "shader_tiny_silhouette.npz"))
    return cfg, params


def _render(cfg, params, az_deg, theta_deg, radius):
    """Render chair.binvox at a pose given in the training-filename
    convention (azimuth, theta, radius) — pose elevation = 90 - theta,
    exactly what pose_from_name produces for `_p{az}_t{theta}_r{radius}`."""
    import jax
    import jax.numpy as jnp

    from rendernet_tpu.io import load_binvox
    from rendernet_tpu.models.shader import shader_forward

    vox = load_binvox("/root/reference/binvox/chair.binvox").astype(np.float32)
    pose = np.array(
        [[np.deg2rad(az_deg), np.deg2rad(90.0 - theta_deg), 3.3 / radius]],
        np.float32,
    )
    img = jax.jit(
        lambda p, v, q: shader_forward(p, v, q, cfg, resample="exact")
    )(params, jnp.asarray(vox[None, :, :, :, None]), jnp.asarray(pose))
    return np.asarray(img)[0, :, :, 0]


def test_trained_render_matches_golden(tiny_net):
    cfg, params = tiny_net
    img = _render(cfg, params, *POSE_DEG)
    golden = np.load(os.path.join(GOLDEN, "shader_tiny_render.npy")).astype(
        np.float32
    )
    assert img.shape == golden.shape
    # fp32 CPU renders are deterministic up to XLA version-to-version
    # reassociation; the committed golden is float16 so quantization alone
    # contributes <= 2^-11.
    diff = np.abs(img - golden)
    assert diff.mean() < 2e-3, diff.mean()
    assert diff.max() < 5e-2, diff.max()


def test_trained_render_quality_on_heldout_pose(tiny_net):
    """The committed net renders a real silhouette at a pose it never saw.

    Training grid (examples/train_tiny_shader.py): az % 20 == 10,
    theta in {45, 60, 90, 105} — i.e. elevations {45, 30, 0, -15}.
    Probe: az=137 (between 130 and 150), theta=75 (elevation 15, midway
    between the 0 and 30 deg training rings; the theta=75 ring is held
    out of training by construction)."""
    import jax.numpy as jnp

    from rendernet_tpu.io import load_binvox
    from rendernet_tpu.ops.resample import rotate_resample_to_camera
    from rendernet_tpu.ops.transforms import silhouette

    cfg, params = tiny_net
    az, theta, radius = 137.0, 75.0, 3.3
    img = _render(cfg, params, az, theta, radius)

    vox = load_binvox("/root/reference/binvox/chair.binvox").astype(np.float32)
    pose = np.array(
        [[np.deg2rad(az), np.deg2rad(90.0 - theta), 3.3 / radius]], np.float32
    )
    cam = rotate_resample_to_camera(
        jnp.asarray(vox[None, :, :, :, None]), jnp.asarray(pose), new_size=128
    )
    tgt = np.asarray(silhouette(cam))[0, :, :, 0]
    factor = img.shape[0] // tgt.shape[0]
    tgt = np.repeat(np.repeat(tgt, factor, axis=0), factor, axis=1)
    tgt = np.clip(tgt, 0.0, 1.0)

    l1 = np.abs(img - tgt).mean()
    # committed artifact measures 0.0357 here (0.031-0.057 across the
    # held-out ring's azimuths); an untrained net scores ~0.3+
    assert l1 < 0.05, l1


@pytest.mark.slow
def test_pose_search_through_trained_net(tiny_net):
    """Inverse rendering through the COMMITTED TRAINED renderer: the
    coarse-to-fine pose search (the reference's recon mechanism,
    Reconstruct_RenderNet_Face.py:458-537) must rank hypotheses by loss
    and converge on the true pose when the frozen net is a real trained
    model — the property random-net tests cannot exercise
    (tests/test_recon.py checks the machinery; this checks the ranking)."""
    import dataclasses
    import math

    import jax.numpy as jnp

    from rendernet_tpu.io import load_binvox
    from rendernet_tpu.models.shader import shader_forward
    from rendernet_tpu.recon import ReconConfig, ReconModel, reconstruct

    cfg, params = tiny_net
    vox = load_binvox("/root/reference/binvox/chair.binvox").astype(np.float32)

    rcfg = ReconConfig(
        z_dim=4, batch_size=5, inner_steps=2, max_epochs=3,
        new_size=cfg.new_size, pose_eta=0.002,
        phi_mid0=270.0, phi_range0=60.0, theta_mid0=90.0, theta_range0=30.0,
    )
    vox_b = jnp.asarray(
        np.broadcast_to(vox[None, :, :, :, None],
                        (rcfg.batch_size,) + vox.shape + (1,))
    )

    def net_loss(model, latents, target, _cfg):
        img = shader_forward(
            params, vox_b[: latents.pose.shape[0]], latents.pose, cfg,
            resample="exact",
        )
        return jnp.mean((img - target) ** 2, axis=(1, 2, 3))

    true_pose = np.array(
        [[math.radians(255.0), math.radians(8.0), 1.0]], np.float32
    )
    target1 = shader_forward(
        params, vox_b[:1], jnp.asarray(true_pose), cfg, resample="exact"
    )
    target = jnp.tile(target1, (rcfg.batch_size, 1, 1, 1))

    errs = []

    def err_deg(pose_row):
        d = (np.asarray(pose_row) - true_pose[0]) * 180.0 / math.pi
        az = abs(float(d[0])) % 360.0
        return min(az, 360.0 - az) + abs(float(d[1]))

    reconstruct(
        ReconModel(decoder={}, texture={}, renderer={}), target, rcfg,
        callback=lambda e, l, f: errs.append(
            err_deg(l.pose[int(np.argmin(np.asarray(f)))])
        ),
        loss_fn=net_loss,
    )
    # box corners are >= 15+7 deg off; ranking through the trained net +
    # subdivision must land within 12 deg combined error.
    assert errs[-1] <= errs[0], errs
    assert errs[-1] < 12.0, errs
