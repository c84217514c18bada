"""Golden + quality tests on the committed trained TEXTURE/NORMAL net.

``assets/texture_tiny_face.npz`` is a reduced-width two-head face
RenderNet (texture decoder + albedo/normal heads; same topology as
RenderNet_Texture_Face_Normal.py:34-147, arch in
``assets/texture_tiny_arch.json``) trained by
``examples/train_tiny_texture.py`` on the synthetic colored-silhouette
face dataset, where each identity's albedo color is a deterministic
function of its 199-d texture code and the normal target is the
pose-dependent depth-gradient normal map (rendernet_tpu/data/synthetic.py).

Together with tests/test_trained_golden.py (shader) and the recon
convergence artifact, this gives all three reference workloads committed
trained-quality evidence:

  * regression: fixed identity/pose render must match the committed golden
    albedo + normal images (any drift in the texture decoder, dual
    rotation, concat wiring, or either head moves the pixels);
  * quality: at a held-out pose ring (theta=75 was excluded from training
    by construction) the albedo head must reproduce the identity's color
    (a function of its texture code — proof the code is actually decoded)
    and the normal head the pose-dependent normal map.
"""
import json
import os

import numpy as np
import pytest

ASSETS = os.path.join(os.path.dirname(__file__), os.pardir, "assets")
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# Identity 1 of the training set (chair.binvox -> ply80001); its beta is
# committed as a golden fixture (drawn from the dataset generator's seed).
VOX_PATH = "/root/reference/binvox/chair.binvox"
POSE_DEG = (250.0, 60.0, 3.3)  # in-training-grid pose for the regression
HELDOUT_DEG = (137.0, 75.0, 3.3)  # theta=75 ring held out of training


@pytest.fixture(scope="module")
def tiny_tex_net():
    from rendernet_tpu.models.texture_face import TextureFaceConfig
    from rendernet_tpu.train.checkpoint import load_params_npz

    with open(os.path.join(ASSETS, "texture_tiny_arch.json")) as f:
        arch = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in json.load(f).items()
        }
    cfg = TextureFaceConfig(**arch)
    params = load_params_npz(os.path.join(ASSETS, "texture_tiny_face.npz"))
    beta = np.load(os.path.join(GOLDEN, "texture_tiny_beta1.npy")).astype(
        np.float32
    )
    return cfg, params, beta


def _render(cfg, params, beta, az_deg, theta_deg, radius):
    import jax
    import jax.numpy as jnp

    from rendernet_tpu.io import load_binvox
    from rendernet_tpu.models.texture_face import texture_face_forward

    vox = load_binvox(VOX_PATH).astype(np.float32)
    pose = np.array(
        [[np.deg2rad(az_deg), np.deg2rad(90.0 - theta_deg), 3.3 / radius]],
        np.float32,
    )
    albedo, normal = jax.jit(
        lambda p, v, t, q: texture_face_forward(p, v, t, q, cfg)
    )(
        params,
        jnp.asarray(vox[None, :, :, :, None]),
        jnp.asarray(beta.reshape(1, -1)),
        jnp.asarray(pose),
    )
    return np.asarray(albedo)[0], np.asarray(normal)[0]


def test_trained_texture_render_matches_golden(tiny_tex_net):
    cfg, params, beta = tiny_tex_net
    albedo, normal = _render(cfg, params, beta, *POSE_DEG)
    g_albedo = np.load(
        os.path.join(GOLDEN, "texture_tiny_albedo.npy")
    ).astype(np.float32)
    g_normal = np.load(
        os.path.join(GOLDEN, "texture_tiny_normal.npy")
    ).astype(np.float32)
    assert albedo.shape == g_albedo.shape and normal.shape == g_normal.shape
    for img, gold in ((albedo, g_albedo), (normal, g_normal)):
        diff = np.abs(img - gold)
        # committed goldens are float16: quantization alone <= 2^-11
        assert diff.mean() < 2e-3, diff.mean()
        assert diff.max() < 5e-2, diff.max()


def test_trained_texture_quality_on_heldout_pose(tiny_tex_net):
    """Held-out pose: albedo reproduces the identity color (decoded from
    the texture code), normal head reproduces the pose-dependent map."""
    from rendernet_tpu.data.synthetic import _render_sil_normal, beta_to_rgb
    from rendernet_tpu.io import load_binvox

    cfg, params, beta = tiny_tex_net
    az, theta, radius = HELDOUT_DEG
    albedo, normal = _render(cfg, params, beta, az, theta, radius)

    vox = load_binvox(VOX_PATH).astype(np.float32)
    pose = np.array(
        [np.deg2rad(az), np.deg2rad(90.0 - theta), 3.3 / radius], np.float32
    )
    img_res = albedo.shape[0]
    sil_t, nrm_t = _render_sil_normal(vox, pose, img_res)
    alb_t = sil_t[..., None] * beta_to_rgb(beta)[None, None, :]

    alb_l1 = np.abs(albedo - alb_t).mean()
    nrm_l1 = np.abs(normal - nrm_t).mean()
    # Bars set from the committed artifact's measured held-out numbers
    # (examples/train_tiny_texture.py summary) with ~2x margin; an
    # untrained net scores ~0.25+ on albedo and ~0.2+ on normals.
    assert alb_l1 < 0.06, alb_l1
    assert nrm_l1 < 0.06, nrm_l1


def test_trained_texture_color_tracks_beta(tiny_tex_net):
    """Swapping the texture code changes the rendered color toward the
    new identity's color — the albedo actually flows from beta through
    the decoded, rotated texture grid (not memorized per shape)."""
    from rendernet_tpu.data.synthetic import beta_to_rgb

    cfg, params, beta = tiny_tex_net
    rng = np.random.default_rng(123)
    beta2 = rng.standard_normal(beta.shape).astype(np.float32)
    a1, _ = _render(cfg, params, beta, *POSE_DEG)
    a2, _ = _render(cfg, params, beta2, *POSE_DEG)
    mask = a1.mean(axis=-1) > 0.15
    assert mask.sum() > 100
    c1, c2 = a1[mask].mean(axis=0), a2[mask].mean(axis=0)
    t1, t2 = beta_to_rgb(beta), beta_to_rgb(beta2)
    # predicted color moves with the target color (cosine over centered
    # channels), and each render is closer to ITS target than to the other
    err_match = np.abs(c1 - t1).mean() + np.abs(c2 - t2).mean()
    err_cross = np.abs(c1 - t2).mean() + np.abs(c2 - t1).mean()
    assert err_match < err_cross, (c1, c2, t1, t2)


@pytest.mark.slow
def test_mid_net_reference_scale_azimuth_ranking():
    """The ranking property at the REFERENCE camera-grid scale
    (new_size=128, 512px — the resolution of the reference's face
    workload): rendering 5 azimuth hypotheses through the committed
    trained mid net (assets/texture_mid_face.npz,
    examples/train_tiny_texture.py --arch mid) with the TRUE texture code
    and light, the pose-search ranking (per-sample MSE vs the GT-pose
    render, Reconstruct_RenderNet_Face.py:530-537) must prefer hypotheses
    by azimuth distance — the property the coarse-to-fine box search
    rests on, pinned at the scale of the round-4 trained recon artifact
    (benchmarks/results/inverse_render_refscale_trained_r4.json)."""
    import math

    import jax
    import jax.numpy as jnp

    from rendernet_tpu.io import load_binvox
    from rendernet_tpu.models.texture_face import (
        TextureFaceConfig,
        texture_face_forward,
    )
    from rendernet_tpu.ops.phong import generate_light_pos, phong_composite
    from rendernet_tpu.train.checkpoint import load_params_npz

    with open(os.path.join(ASSETS, "texture_mid_arch.json")) as f:
        arch = {k: tuple(v) if isinstance(v, list) else v
                for k, v in json.load(f).items()}
    cfg = TextureFaceConfig(**arch)
    assert cfg.new_size == 128  # reference camera-grid scale -> 512px
    params = load_params_npz(os.path.join(ASSETS, "texture_mid_face.npz"))
    beta = np.load(os.path.join(ASSETS, "texture_mid_beta1.npy")).astype(
        np.float32
    ).reshape(1, -1)
    vox = load_binvox(VOX_PATH).astype(np.float32)

    true_az, el = 255.0, 8.0
    light_az, light_el = math.radians(280.0), math.radians(90 - 105)
    # 5 hypotheses: GT-nearest is 250 (5 deg off); ranking must order by
    # azimuth distance
    hyp_az = np.array([250.0, 210.0, 290.0, 170.0, 330.0])

    def render(az_deg_batch):
        n = len(az_deg_batch)
        poses = jnp.asarray(np.stack([
            np.deg2rad(az_deg_batch), np.full(n, math.radians(el)),
            np.ones(n),
        ], axis=1).astype(np.float32))
        albedo, normal = texture_face_forward(
            params, jnp.asarray(np.broadcast_to(
                vox[None, :, :, :, None], (n,) + vox.shape + (1,)
            )), jnp.asarray(np.tile(beta, (n, 1))), poses, cfg,
        )
        light_dir = generate_light_pos(
            jnp.full((n, 1), light_az), light_el, n
        )
        shading = phong_composite(
            normal, light_dir, jnp.ones((n, 3), jnp.float32), 0.6, 0.4,
            black_background=False, with_mask=True,
        )
        return albedo * shading

    target = render(np.array([true_az]))
    preds = render(hyp_az)
    losses = np.asarray(
        jnp.mean((preds - target) ** 2, axis=(1, 2, 3))
    )
    order = np.argsort(losses)
    # hyp_az is already sorted by azimuth distance from GT
    assert order[0] == 0, (hyp_az, losses)
    # and the far-out hypotheses must not beat the near ones
    assert losses[0] < losses[3] and losses[0] < losses[4], losses
