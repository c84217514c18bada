"""Inverse-rendering tests (tiny grids; frozen random nets)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rendernet_tpu.models.decoders import (
    init_recon_rendernet_params,
    init_recon_texture_decoder_params,
    init_shape_decoder_params,
)
from rendernet_tpu.recon import (
    Latents,
    ReconConfig,
    ReconModel,
    create_param_center,
    initial_latents,
    make_recon_step,
    recon_forward,
    reconstruct,
    subdivided_latents,
)

pytestmark = pytest.mark.slow

CFG = ReconConfig(
    z_dim=16,
    batch_size=5,
    inner_steps=3,
    max_epochs=2,
    new_size=32,
    light_elevation=(90 - 105) * math.pi / 180.0,
    shape_eta=0.1,
    pose_eta=0.001,
    tex_eta=0.1,
    light_eta=0.05,
)


def _tiny_model():
    # Small z_dim shape decoder still emits 64^3 voxels; renderer runs at
    # new_size=32 depth.
    return ReconModel(
        decoder=init_shape_decoder_params(jax.random.PRNGKey(0), z_dim=CFG.z_dim),
        texture=init_recon_texture_decoder_params(jax.random.PRNGKey(1)),
        renderer=init_recon_rendernet_params(jax.random.PRNGKey(2), new_size=32),
    )


@pytest.fixture(scope="module")
def model():
    return _tiny_model()


@pytest.fixture(scope="module")
def single_step(model):
    """One compiled single-step optimizer shared across tests (compiling the
    3-network pipeline dominates this file's runtime)."""
    return make_recon_step(model, CFG)


@pytest.fixture(scope="module")
def scan_run(model):
    """One compiled inner-loop scan, shared by the scan and driver tests."""
    return make_recon_step(model, CFG, scan_steps=CFG.inner_steps)


def test_create_param_center_matches_reference_semantics():
    p = create_param_center(phi_mid=270, phi_range=60, theta_mid=90, theta_range=30)
    assert p.shape == (5, 3)
    # row 2 is the midpoint hypothesis
    assert p[2, 0] == pytest.approx(270 * math.pi / 180.0)
    assert p[2, 1] == pytest.approx(0.0)
    assert np.all(p[:, 2] == 1.0)
    # azimuth wraps modulo 360
    p2 = create_param_center(phi_mid=350, phi_range=60, theta_mid=90, theta_range=30)
    assert p2[3, 0] == pytest.approx(((350 + 30) % 360) * math.pi / 180.0)


def test_recon_forward_shapes(model):
    latents = initial_latents(CFG)
    compos, albedo, normal, shape = recon_forward(model, latents, CFG)
    assert compos.shape == (5, 128, 128, 3)  # 32-grid -> 4x upsample
    assert shape.shape == (5, 64, 64, 64, 1)
    assert np.isfinite(np.asarray(compos)).all()


def test_recon_step_only_updates_latents_and_decreases_loss(model, single_step):
    target = jnp.full((5, 128, 128, 3), 0.4, jnp.float32)
    step = single_step
    latents = initial_latents(CFG)
    l0 = None
    for i in range(6):
        latents, losses = step(latents, target)
        if l0 is None:
            l0 = np.asarray(losses)
    lN = np.asarray(losses)
    assert np.isfinite(lN).all()
    assert lN.mean() < l0.mean()


def test_recon_scan_matches_stepwise(model, single_step, scan_run):
    target = jnp.full((5, 128, 128, 3), 0.4, jnp.float32)
    run = scan_run
    step = single_step
    latents0 = initial_latents(CFG)
    scan_latents, scan_losses = run(latents0, target)
    latents = latents0
    manual_losses = []
    for _ in range(CFG.inner_steps):
        latents, losses = step(latents, target)
        manual_losses.append(np.asarray(losses))
    np.testing.assert_allclose(
        np.asarray(scan_losses), np.stack(manual_losses), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(scan_latents.pose), np.asarray(latents.pose), rtol=2e-4
    )


def test_reconstruct_driver_runs_and_subdivides(model, scan_run):
    target = jnp.full((5, 128, 128, 3), 0.4, jnp.float32)
    seen = []
    latents, history, curves = reconstruct(
        model, target, CFG, callback=lambda e, l, f: seen.append(e), run=scan_run
    )
    assert history.shape == (2, 5)
    assert curves.shape == (2, CFG.inner_steps, 5)
    np.testing.assert_allclose(curves[:, -1], history)
    assert seen == [0, 1]
    assert np.isfinite(history).all()


def test_reconstruct_pose_error_shrinks_across_epochs():
    """The coarse-to-fine search CONVERGES on pose when the forward model
    can actually rank hypotheses. Random frozen nets cannot (their renders
    are nearly pose-ambiguous blobs — ranking is noise, and greedy box
    subdivision then traps itself; the reference always searches through
    PRETRAINED nets, Reconstruct_RenderNet_Face.py:336-338). So this test
    drives the identical machinery — make_recon_step grouping, lax.scan
    inner loop, best-of-batch ranking, box subdivision (:458-537) — with a
    pose-identifiable differentiable forward: rotate a real chair voxel
    grid by the hypothesis pose and match its silhouette. The trained-net
    equivalents live in test_trained_golden*.py / the committed recon
    artifacts."""
    import dataclasses

    from rendernet_tpu.io import load_binvox
    from rendernet_tpu.ops.resample import rotate_resample_to_camera
    from rendernet_tpu.ops.transforms import silhouette

    cfg = dataclasses.replace(CFG, inner_steps=4, max_epochs=3, pose_eta=0.002)
    vox = load_binvox("/root/reference/binvox/chair.binvox").astype(np.float32)
    vox_b = jnp.asarray(
        np.broadcast_to(vox[None, :, :, :, None], (cfg.batch_size,) + vox.shape + (1,))
    )

    def sil_loss(model, latents, target, cfg):
        cam = rotate_resample_to_camera(vox_b, latents.pose, new_size=cfg.new_size)
        sil = silhouette(cam)
        return jnp.mean((sil - target) ** 2, axis=(1, 2, 3))

    true_pose = np.array(
        [[255.0 * math.pi / 180.0, 8.0 * math.pi / 180.0, 1.0]], np.float32
    )
    cam_t = rotate_resample_to_camera(
        jnp.asarray(vox[None, :, :, :, None]), jnp.asarray(true_pose),
        new_size=cfg.new_size,
    )
    target = jnp.tile(silhouette(cam_t), (cfg.batch_size, 1, 1, 1))

    def err_deg(pose_row):
        d = (np.asarray(pose_row) - true_pose[0]) * 180.0 / math.pi
        az = abs(float(d[0])) % 360.0
        return min(az, 360.0 - az) + abs(float(d[1]))

    errs = []
    latents, history, _ = reconstruct(
        ReconModel(decoder={}, texture={}, renderer={}), target, cfg,
        callback=lambda e, l, f: errs.append(
            err_deg(l.pose[int(np.argmin(np.asarray(f)))])
        ),
        loss_fn=sil_loss,
    )
    assert len(errs) == cfg.max_epochs
    # Epoch 1's best corner of the 270+-30 x 90+-15 box is >= ~15+8 deg
    # off the true (255, el 8); ranking + subdivision + pose grads must at
    # least halve the combined error and land within 10 deg total.
    assert errs[-1] < errs[0] * 0.5, errs
    assert errs[-1] < 10.0, errs


def test_cross_grid_recovers_elevation_where_corners_stall():
    """Regression pin for the round-4 refscale failure
    (inverse_render_refscale_trained_r4.json: az 0.26° but el stuck at
    8.6–9.4° over 10 epochs). Scenario: azimuth already at the box
    center, true elevation offset INSIDE the theta box. The reference's
    "corners" grid only offers off-center thetas paired with wrong-phi
    corners, so best-of-batch keeps the (wrong-el) center and the box
    halves around it; the "cross" grid offers theta arms at the correct
    azimuth and bisects elevation down. Geometric silhouette forward =
    same machinery, pose-identifiable ranking (see
    test_reconstruct_pose_error_shrinks_across_epochs)."""
    import dataclasses

    from rendernet_tpu.io import load_binvox
    from rendernet_tpu.ops.resample import rotate_resample_to_camera
    from rendernet_tpu.ops.transforms import silhouette

    vox = load_binvox("/root/reference/binvox/chair.binvox").astype(np.float32)

    true_el_deg = 9.0  # the r4 stall magnitude
    true_pose = np.array(
        [[270.0 * math.pi / 180.0, true_el_deg * math.pi / 180.0, 1.0]],
        np.float32,
    )

    def run(grid_shape, batch_size):
        cfg = dataclasses.replace(
            CFG, inner_steps=4, max_epochs=5, pose_eta=0.0005,
            grid_shape=grid_shape, batch_size=batch_size,
        )
        vox_b = jnp.asarray(np.broadcast_to(
            vox[None, :, :, :, None], (batch_size,) + vox.shape + (1,)
        ))

        def sil_loss(model, latents, target, cfg):
            cam = rotate_resample_to_camera(
                vox_b, latents.pose, new_size=cfg.new_size
            )
            return jnp.mean((silhouette(cam) - target) ** 2, axis=(1, 2, 3))

        cam_t = rotate_resample_to_camera(
            jnp.asarray(vox[None, :, :, :, None]), jnp.asarray(true_pose),
            new_size=cfg.new_size,
        )
        target = jnp.tile(silhouette(cam_t), (batch_size, 1, 1, 1))
        el_errs = []
        reconstruct(
            ReconModel(decoder={}, texture={}, renderer={}), target, cfg,
            callback=lambda e, l, f: el_errs.append(abs(
                float(l.pose[int(np.argmin(np.asarray(f)))][1])
                * 180.0 / math.pi - true_el_deg
            )),
            loss_fn=sil_loss,
        )
        return el_errs

    el_cross = run("cross", CFG.batch_size)
    assert el_cross[-1] < 3.0, el_cross
    # and the fix matters: the reference's corner grid stalls well above
    # the cross grid's final error on the identical problem
    el_corners = run("corners", CFG.batch_size)
    assert el_cross[-1] < el_corners[-1], (el_cross, el_corners)


def test_subdivided_latents_tiles_best():
    latents = initial_latents(CFG)
    new = subdivided_latents(latents, best_idx=3, phi_range=30, theta_range=15, cfg=CFG)
    np.testing.assert_allclose(
        np.asarray(new.vector), np.tile(np.asarray(latents.vector[3])[None], (5, 1))
    )
    assert new.pose.shape == (5, 3)


def test_on_center_halving_keeps_unresolved_axis_resolution():
    """halve_mode="on_center": the search box shrinks only on epochs the
    CENTER hypothesis wins — while an off-center arm keeps winning, the
    box moves at constant resolution. Pinned with a deterministic pose
    quadratic whose optimum sits outside the first boxes (the refscale
    failure geometry: azimuth resolves by arm selection first, and
    lockstep halving strands elevation — benchmarks/recon_arm_diag.py)."""
    import dataclasses

    true_az = math.radians(322.0)  # off-grid: selection must WALK to it
    true_el = math.radians(12.0)
    w = math.radians(6.0)

    def pose_loss(model, latents, target, cfg):
        # The refscale coupling (benchmarks/recon_arm_diag.py): elevation
        # is only observable once azimuth is close — until then the el
        # term is gated out, so early epochs rank azimuth alone.
        d_az = latents.pose[:, 0] - true_az
        d_el = latents.pose[:, 1] - true_el
        return d_az**2 + jnp.exp(-(d_az / w) ** 2) * d_el**2

    target = jnp.zeros((CFG.batch_size, 1, 1, 1))

    def run(halve_mode):
        cfg = dataclasses.replace(
            CFG, inner_steps=1, max_epochs=10, pose_eta=0.0,
            grid_shape="cross", halve_mode=halve_mode,
        )
        latents, history, _ = reconstruct(
            ReconModel(decoder={}, texture={}, renderer={}), target, cfg,
            loss_fn=pose_loss,
        )
        best = int(np.argmin(np.asarray(history[-1])))
        az = math.degrees(float(latents.pose[best, 0])) % 360
        el = math.degrees(float(latents.pose[best, 1]))
        return abs(az - 322.0), abs(el - 12.0)

    az_pc, el_pc = run("on_center")
    # pose_eta=0 isolates pure box-search dynamics: on_center resolves
    # azimuth first (arms win -> box MOVES at full resolution) and still
    # has theta resolution left to walk elevation afterwards
    assert az_pc < 2.0 and el_pc < 3.0, (az_pc, el_pc)
    az_al, el_al = run("always")
    # the reference's lockstep halving spends the theta box while the el
    # signal is still gated off -> elevation strands (the r4/r5 refscale
    # stall), while on_center recovers it
    assert el_al > 4.0, (az_al, el_al)
    assert el_pc < el_al, (el_pc, el_al)
